package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  test("mixed float/double operands read each side at its own width") {
    val r = spark.range(1).select(
      VectorExpressions.dotFast(
        array(lit(1.0f), lit(2.0f)), array(lit(3.0), lit(4.0))).as("d"),
      VectorExpressions.cosineFast(
        array(lit(1.0f), lit(0.0f)), array(lit(1.0), lit(0.0))).as("c"))
      .head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("matches the HOF reference implementation bit-for-bit") {
    val e = graft.Tables.embeddings(spark, sf).limit(100)
    val diff = e.select(
      (VectorExpressions.cosineFast(col("embedding"), col("embedding")) -
        VectorFunctions.cosine(col("embedding"), col("embedding"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("non-array arguments fail analysis, not execution") {
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(
        VectorExpressions.cosineFast(lit("nope"), array(lit(1.0)))).head()
    }
  }

  test("q8 roundtrip: bounded error, zero-safe, clamps to ±127 steps") {
    val r = spark.range(1).select(
      VectorExpressions.q8Roundtrip(
        array(lit(1.0), lit(-0.5), lit(0.25), lit(0.0))).as("v"),
      VectorExpressions.q8Roundtrip(
        array(lit(0.0f), lit(0.0f))).as("z"))
      .head()
    val v = r.getSeq[Double](0)
    // max quantization error per element is scale/2 = maxabs/254
    assert(v.zip(Seq(1.0, -0.5, 0.25, 0.0)).forall {
      case (got, want) => math.abs(got - want) <= 1.0 / 254 + 1e-12
    })
    assert(v.head == 1.0) // maxabs element is exactly representable (q=127)
    assert(r.getSeq[Double](1) == Seq(0.0, 0.0))
    // fidelity on real embeddings: cosine(orig, roundtrip) stays ~1
    val e = graft.Tables.embeddings(spark, sf).limit(200)
    val minFid = e.select(VectorExpressions.cosineFast(col("embedding"),
        VectorExpressions.q8Roundtrip(col("embedding"))).as("f"))
      .agg(min("f")).head().getDouble(0)
    assert(minFid > 0.999, s"q8 fidelity too low: $minFid")
  }

  test("vector_l2_normalize ≡ the HOF composition bit-for-bit") {
    import org.apache.spark.sql.functions.{aggregate => agg_, _}
    val e = graft.Tables.embeddings(spark, sf).limit(200)
    // HOF reference: transform(asDouble, _ / sqrt(Σx²)) — the numerics
    // contract the native one-pass expression must reproduce exactly
    def asD(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))
    def hofNorm(c: org.apache.spark.sql.Column) =
      sqrt(agg_(zip_with(asD(c), asD(c), _ * _), lit(0.0), (a, x) => a + x))
    val both = e.select(
      VectorExpressions.l2NormalizeFast(col("embedding")).as("nat"),
      transform(asD(col("embedding")), _ / hofNorm(col("embedding"))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
    // unit norm (up to float error) and zero-vector passthrough
    val n = e.select(VectorExpressions.dotFast(
        VectorExpressions.l2NormalizeFast(col("embedding")),
        VectorExpressions.l2NormalizeFast(col("embedding"))).as("n"))
      .agg(min("n"), max("n")).head()
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-12 &&
      math.abs(n.getDouble(1) - 1.0) < 1e-12)
    val z = spark.sql("SELECT array(0.0F, 0.0F) v")
      .select(VectorExpressions.l2NormalizeFast(col("v"))).head()
    assert(z.getSeq[Double](0) == Seq(0.0, 0.0))
  }

  test("rhp signature: codegen and interpreted eval agree") {
    val e = graft.Tables.embeddings(spark, sf).limit(100)
    // codegen path (whole-stage projection)
    val gen = e.select(col("vec_id"),
      VectorExpressions.rhpSignature(col("embedding"), 12, 42L).as("s"))
      .orderBy("vec_id").collect().map(_.getLong(1)).toSeq
    // interpreted path: eval() the expression directly against each array
    val vecs = e.orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    val interp = vecs.map { v =>
      RhpSignature(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        12, 42L).eval(null)
    }.toSeq
    assert(gen == interp)
    assert(gen.distinct.size > 1) // signatures actually vary across vectors
  }

  test("sig_match_count equals the size(filter(zip_with)) formulation on every edge") {
    import spark.implicits._
    // the HOF tree it replaces, rebuilt verbatim (the est_jaccard
    // numerator in SignatureStore.probeCore/selfPairs and
    // Dedup.minhashLshCandidates)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      size(filter(zip_with(a, b, (x, y) => (x === y).cast("int")), _ === 1))
    val rnd = new scala.util.Random(13)
    // random pairs over a SMALL value domain so equal positions are
    // common; lengths vary 0..40 so the min-length truncation is hit;
    // ~5% null elements so the both-non-null rule is hit
    def arr(): Seq[Option[Long]] = Seq.fill(rnd.nextInt(41))(
      if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(4).toLong))
    val pairs = (0 until 500).map(_ => (arr(), arr()))
      .toDF("sig_a", "sig_b")
    val diff = pairs.select(
        VectorExpressions.sigMatchCount(col("sig_a"), col("sig_b")).as("f"),
        hof(col("sig_a"), col("sig_b")).as("h"))
      .filter(col("f") =!= col("h")).count()
    assert(diff == 0L)
    // null ARRAY input → null, matching size(zip_with(null, b)) under
    // the Spark 3+ sizeOfNull default
    val withNull = Seq(
      (Some(Seq(1L, 2L)), Option.empty[Seq[Long]]),
      (Option.empty[Seq[Long]], Some(Seq(1L, 2L))))
      .toDF("sig_a", "sig_b")
    val r = withNull.select(
      VectorExpressions.sigMatchCount(col("sig_a"), col("sig_b")).as("f"),
      hof(col("sig_a"), col("sig_b")).as("h")).collect()
    assert(r.forall(row => row.isNullAt(0) && row.isNullAt(1)))
    // empty arrays → 0, both formulations
    val empty = Seq((Seq.empty[Long], Seq(1L, 2L))).toDF("sig_a", "sig_b")
    val er = empty.select(
      VectorExpressions.sigMatchCount(col("sig_a"), col("sig_b")),
      hof(col("sig_a"), col("sig_b"))).head()
    assert(er.getInt(0) == 0 && er.getInt(1) == 0)
    // int-typed signature arrays take the other element getter
    val ints = Seq((Seq(1, 2, 3), Seq(1, 9, 3))).toDF("sig_a", "sig_b")
    assert(ints.select(VectorExpressions.sigMatchCount(col("sig_a"),
      col("sig_b"))).head().getInt(0) == 2)
    // mixed element types fail analysis, not execution
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq((Seq(1L), Seq(1))).toDF("a", "b").select(
        VectorExpressions.sigMatchCount(col("a"), col("b"))).head()
    }
    // interpreted fallback agrees with codegen (the eval() twin)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val lit1 = Literal(ArrayData.toArrayData(Array(1L, 2L, 3L, 4L)),
      ArrayType(LongType))
    val lit2 = Literal(ArrayData.toArrayData(Array(1L, 9L, 3L, 7L)),
      ArrayType(LongType))
    assert(SigMatchCount(lit1, lit2).eval(null) == 2)
  }

  test("minhash_signature equals the explode+min-aggregate formulation") {
    import spark.implicits._
    val nh = 16
    // the aggregate reference bandedSignatures carried before r17:
    // explode(shingle) -> min(xxhash64(shingle, lit(seed))) per seed
    def aggForm(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sh = df.select(col("doc_id").as("_id"),
        explode(TextFunctions.wordShingles(col("text"), 3)).as("shingle"))
      val aggs = (0 until nh).map(seed =>
        min(xxhash64(col("shingle"), lit(seed))).as(s"_h$seed"))
      sh.groupBy("_id").agg(aggs.head, aggs.tail: _*)
        .select(col("_id"),
          array((0 until nh).map(i => col(s"_h$i")): _*).as("sig"))
    }
    def nativeForm(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id").as("_id"),
          TextFunctions.wordShingles(col("text"), 3).as("_sh"))
        .where(size(col("_sh")) > 0)
        .select(col("_id"),
          VectorExpressions.minhashSignature(col("_sh"), nh).as("sig"))
    val docs = graft.Tables.documents(spark, sf).limit(300)
      .select("doc_id", "text")
    val a = aggForm(docs).orderBy("_id").collect()
    val b = nativeForm(docs).orderBy("_id").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Long](1) == y.getSeq[Long](1),
        s"doc ${x.getLong(0)} signature diverged")
    }
    // empty-text docs DROP in both forms (the explode semantics callers
    // of bandedSignatures rely on)
    val withEmpty = Seq((1L, "alpha beta gamma delta"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    assert(nativeForm(withEmpty).select("_id").as[Long].collect().toSet
      == aggForm(withEmpty).select("_id").as[Long].collect().toSet)
    // null element -> the no-bytes hash (xxhash64 null-skip): equals the
    // SQL two-argument fold with a null first argument
    val viaSql = spark.range(1).select(
      (0 until nh).map(s0 =>
        xxhash64(lit(null).cast("string"), lit(s0)).as(s"h$s0")): _*).head()
    val viaExpr = Seq(Tuple1(Seq[String](null))).toDF("sh")
      .select(VectorExpressions.minhashSignature(col("sh"), nh)).head()
      .getSeq[Long](0)
    (0 until nh).foreach(i => assert(viaExpr(i) == viaSql.getLong(i)))
    // null array -> null; non-string array fails analysis
    assert(Seq(Tuple1(null: Seq[String])).toDF("sh")
      .select(VectorExpressions.minhashSignature(col("sh"), nh))
      .head().isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq(1L))).toDF("sh")
        .select(VectorExpressions.minhashSignature(col("sh"), nh)).head()
    }
    // interpreted fallback agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val lt = Literal(ArrayData.toArrayData(Array(
      UTF8String.fromString("a b c"), UTF8String.fromString("b c d"))),
      ArrayType(StringType))
    val viaGen = Seq(Tuple1(Seq("a b c", "b c d"))).toDF("sh")
      .select(VectorExpressions.minhashSignature(col("sh"), nh)).head()
      .getSeq[Long](0)
    assert(MinHashSignature(lt, nh).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == viaGen)
  }

  test("simhash64 equals the nested-HOF fold on every edge: ties, nulls, empty") {
    import spark.implicits._
    // the HOF reference: the exact fold Dedup.simhash carried (xxhash64
    // per token, +1/-1 per bit, sign>0 sets the bit), parameterized by
    // the token ARRAY so null elements are directly plantable
    def hof(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      def shr(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
        call_function("shiftright", c, n)
      def shl(c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
        call_function("shiftleft", c, n)
      val hashes = transform(toks, t => xxhash64(t))
      val counts = aggregate(hashes, array_repeat(lit(0), 64),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(shr(h, i.cast("int")).bitwiseAND(1) === 1, 1)
            .otherwise(-1)))
      aggregate(
        zip_with(counts, sequence(lit(0), lit(63)),
          (c, i) => when(c > 0, shl(lit(1L), i.cast("int"))).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    }
    // general corpus equivalence incl. repeated tokens (sum magnitudes
    // > 1) and even token counts (tie-able sums)
    val docs = graft.Tables.documents(spark, sf).limit(300)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
    val d = docs.select(
      (VectorExpressions.simhash64(col("t")) =!= hof(col("t")))
        .cast("int").as("neq"))
      .agg(sum("neq")).head().getLong(0)
    assert(d == 0L, s"$d docs diverged from the HOF fold")
    // planted edges: tie (two tokens -> sums in {-2,0,2}; every 0 must
    // give bit 0), null element (hashes to the xxhash64 seed, 42),
    // empty array, null array, single token (signature = hash's set
    // bits)
    val edges = Seq(
      (1L, Seq[String]("alpha", "beta")),
      (2L, Seq[String]("alpha", null)),
      (3L, Seq[String]()),
      (5L, Seq[String]("only"))).toDF("id", "t")
    val er = edges.select(col("id"),
      VectorExpressions.simhash64(col("t")).as("n"), hof(col("t")).as("h"))
      .collect()
    er.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)} diverged")
    }
    // the tie row really ties somewhere: two distinct hashes differ in
    // >= 1 bit, and each differing bit sums to 0 -> bit 0 in BOTH forms
    val tie = er.find(_.getLong(0) == 1L).get
    val h1 = edges.filter(col("id") === 5L)
      .select(xxhash64(lit("alpha"))).head().getLong(0)
    val h2 = edges.filter(col("id") === 5L)
      .select(xxhash64(lit("beta"))).head().getLong(0)
    assert((h1 ^ h2) != 0L)
    assert((tie.getLong(1) & (h1 ^ h2)) == 0L,
      "a tied bit position must resolve to 0")
    // null ARRAY -> null signature
    val nr = Seq((4L, null: Seq[String])).toDF("id", "t")
      .select(VectorExpressions.simhash64(col("t"))).head()
    assert(nr.isNullAt(0))
    // single token: signature == the token hash's set-bit mask
    val single = er.find(_.getLong(0) == 5L).get
    val hOnly = spark.range(1).select(xxhash64(lit("only"))).head().getLong(0)
    assert(single.getLong(1) == hOnly)
    // non-string arrays fail analysis, not execution
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1L)).toDF("t").select(
        VectorExpressions.simhash64(col("t"))).head()
    }
    // interpreted fallback agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val litToks = Literal(ArrayData.toArrayData(Array(
      UTF8String.fromString("alpha"), UTF8String.fromString("beta"))),
      ArrayType(StringType))
    assert(SimHash64(litToks).eval(null) == tie.getLong(1))
  }
}
