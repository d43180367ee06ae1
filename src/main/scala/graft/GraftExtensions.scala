package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSignature, MultiSubstringMatch, PrefixIndexHash56, RepetitionScore, RhpSignature, SigMatchCount, SimHash64, TermFreqStats, VectorCosine, VectorDot, VectorL2Sq, VectorQ8Roundtrip, WordShingleHash56, WordShingles}

/** Session extensions registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT vector_cosine(a, b) ...")` works the
  * same as the Column API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *   // or, on a live session: GraftExtensions.registerAll(spark)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.GeoRules.GeoRadiusPrefilter)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def binary(name: String, f: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = {
    require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  /** A trailing parameter that must be a foldable integer literal (shingle
    * width, bit count, seed) — these configure codegen, they cannot vary
    * per row.
    */
  private def litLong(e: Expression, fn: String, param: String): Long = {
    require(e.foldable, s"$fn: $param must be a literal")
    e.eval() match {
      case n: java.lang.Number => n.longValue
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be an integer literal, got $other")
    }
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_cosine"),
      info("vector_cosine", "cosine similarity of two float/double arrays"),
      binary("vector_cosine", VectorCosine) _),
    (FunctionIdentifier("vector_dot"),
      info("vector_dot", "dot product of two float/double arrays"),
      binary("vector_dot", VectorDot) _),
    (FunctionIdentifier("vector_l2sq"),
      info("vector_l2sq", "squared L2 distance of two float/double arrays"),
      binary("vector_l2sq", VectorL2Sq) _),
    (FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(tokens): 64-bit SimHash of an array<string> token " +
          "list — xxhash64 per token, sign-of-bit-sums signature"),
      { args =>
        require(args.length == 1,
          s"simhash64 expects 1 argument, got ${args.length}")
        SimHash64(args(0))
      }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(shingles, k): k seeded-xxhash64 minima of an " +
          "array<string> shingle list, one pass"),
      { args =>
        require(args.length == 2,
          s"minhash_signature expects 2 arguments, got ${args.length}")
        MinHashSignature(args(0),
          litLong(args(1), "minhash_signature", "k").toInt)
      }),
    (FunctionIdentifier("sig_match_count"),
      info("sig_match_count",
        "sig_match_count(a, b): positions where two integral signature " +
          "arrays agree (the est_jaccard numerator)"),
      binary("sig_match_count", SigMatchCount) _),
    (FunctionIdentifier("vector_q8_roundtrip"),
      info("vector_q8_roundtrip",
        "symmetric int8 quantize+dequantize of a float/double array"),
      { args =>
        require(args.length == 1, s"vector_q8_roundtrip expects 1 argument, got ${args.length}")
        VectorQ8Roundtrip(args(0))
      }),
    (FunctionIdentifier("vector_l2_normalize"),
      info("vector_l2_normalize",
        "L2-normalize a float/double array to a unit vector (zero vectors pass through)"),
      { args =>
        require(args.length == 1, s"vector_l2_normalize expects 1 argument, got ${args.length}")
        graft.functions.VectorL2Normalize(args(0))
      }),
    (FunctionIdentifier("rhp_signature"),
      info("rhp_signature",
        "rhp_signature(vec, nBits, seed): random-hyperplane LSH signature"),
      { args =>
        require(args.length == 3, s"rhp_signature expects 3 arguments, got ${args.length}")
        RhpSignature(args(0),
          litLong(args(1), "rhp_signature", "nBits").toInt,
          litLong(args(2), "rhp_signature", "seed"))
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n): word n-gram array"),
      { args =>
        require(args.length == 2, s"word_shingles expects 2 arguments, got ${args.length}")
        WordShingles(args(0), litLong(args(1), "word_shingles", "n").toInt)
      }),
    (FunctionIdentifier("word_shingle_hash56"),
      info("word_shingle_hash56",
        "word_shingle_hash56(text, n): md5-56 of every word n-gram " +
          "shingle in one pass (the sampleHash family)"),
      { args =>
        require(args.length == 2,
          s"word_shingle_hash56 expects 2 arguments, got ${args.length}")
        WordShingleHash56(args(0),
          litLong(args(1), "word_shingle_hash56", "n").toInt)
      }),
    (FunctionIdentifier("prefix_index_hash56"),
      info("prefix_index_hash56",
        "prefix_index_hash56(prefix, count): [md5_56(prefix || i)] " +
          "for i in 0 until count"),
      { args =>
        require(args.length == 2,
          s"prefix_index_hash56 expects 2 arguments, got ${args.length}")
        PrefixIndexHash56(args(0), args(1))
      }),
    (FunctionIdentifier("multi_substring_match"),
      info("multi_substring_match",
        "multi_substring_match(text, pattern, ...): distinct literal " +
          "patterns occurring as substrings, one Aho-Corasick pass"),
      { args =>
        require(args.length >= 2,
          s"multi_substring_match expects text plus at least one pattern, got ${args.length} argument(s)")
        val pats = args.tail.map { e =>
          require(e.foldable, "multi_substring_match: patterns must be string literals")
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"multi_substring_match: pattern literal expected, got $other")
          }
        }
        MultiSubstringMatch(args(0), pats)
      }),
    (FunctionIdentifier("repetition_score"),
      info("repetition_score",
        "repetition_score(text, n): top n-gram frequency / total n-grams"),
      { args =>
        require(args.length == 2, s"repetition_score expects 2 arguments, got ${args.length}")
        RepetitionScore(args(0), litLong(args(1), "repetition_score", "n").toInt)
      }),
    (FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(score, id, k): aggregate keeping the k highest-" +
          "scoring (score, id) pairs, O(k) state, ties to the smaller id"),
      { args =>
        require(args.length == 3, s"top_k_by_score expects 3 arguments, got ${args.length}")
        graft.functions.TopKByScore(args(0), args(1),
          litLong(args(2), "top_k_by_score", "k").toInt)
      }),
    (FunctionIdentifier("term_freq_stats"),
      info("term_freq_stats",
        "term_freq_stats(text, term, ...): one-pass struct(dl, tf[]) for the literal terms"),
      { args =>
        require(args.length >= 2,
          s"term_freq_stats expects text plus at least one term, got ${args.length} argument(s)")
        val terms = args.tail.map { e =>
          require(e.foldable, "term_freq_stats: terms must be string literals")
          e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"term_freq_stats: terms must be string literals, got $other")
          }
        }
        TermFreqStats(args.head, terms)
      }))

  /** Register into an already-built session (tests, notebooks). The
    * optimizer rule goes through `experimental.extraOptimizations` —
    * the live-session escape hatch for rules (idempotent add).
    */
  def registerAll(spark: SparkSession): Unit = {
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    val rule = graft.plans.GeoRules.GeoRadiusPrefilter
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
