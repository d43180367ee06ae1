package graft

class GraftExtensionsSpec extends SparkSpec {

  test("vector functions are callable from SQL once registered") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT vector_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                vector_l2sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l
      """).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 25.0)
  }

  test("text and quantization expressions are callable from SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT word_shingles('a b c d', 3) AS sh,
                repetition_score('spam spam spam spam', 3) AS rep,
                vector_q8_roundtrip(array(1.0D, -0.5D)) AS q,
                rhp_signature(array(1.0F, 2.0F), 12, 42) AS sig
      """).head()
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getDouble(1) == 1.0)
    assert(r.getSeq[Double](2).head == 1.0)
    // same signature as the Column API path
    val viaColumn = spark.range(1).select(
      functions.VectorExpressions.rhpSignature(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(1.0f),
          org.apache.spark.sql.functions.lit(2.0f)), 12, 42L)).head().getLong(0)
    assert(r.getLong(3) == viaColumn)
  }

  test("round-9 hash/blocklist expressions are callable from SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT word_shingle_hash56('a b c d', 3) AS h,
                prefix_index_hash56('7:', 2) AS p,
                multi_substring_match('xabcx', 'ab', 'zz', 'bc') AS m
      """).head()
    // values match the Column-side md5-56 family
    val viaCol = spark.range(1).select(
      graft.functions.TextExpressions.wordShingleHash56(
        org.apache.spark.sql.functions.lit("a b c d"), 3)).head()
      .getSeq[Long](0)
    assert(r.getSeq[Long](0) == viaCol)
    assert(r.getSeq[Long](1).length == 2)
    assert(r.getSeq[String](2) == Seq("ab", "bc"))
  }

  test("simhash64 and sig_match_count are callable from SQL") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash64(array('alpha', 'beta', 'alpha')) AS s,
                sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m
      """).head()
    val viaCol = spark.range(1).select(
      graft.functions.VectorExpressions.simhash64(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("alpha"),
          org.apache.spark.sql.functions.lit("beta"),
          org.apache.spark.sql.functions.lit("alpha")))).head().getLong(0)
    assert(r.getLong(0) == viaCol)
    assert(r.getInt(1) == 2)
    // minhash_signature: SQL form == the two-argument xxhash64 fold
    val mh = spark.sql(
      """SELECT minhash_signature(array('a b c'), 4) AS sig,
                array(xxhash64('a b c', 0), xxhash64('a b c', 1),
                      xxhash64('a b c', 2), xxhash64('a b c', 3)) AS want
      """).head()
    assert(mh.getSeq[Long](0) == mh.getSeq[Long](1))
  }

  test("term_freq_stats is callable from SQL with literal terms") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT term_freq_stats('Merge the scan then merge', 'merge', 'scan') AS s")
      .selectExpr("s.dl", "s.tf[0]", "s.tf[1]").head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 2 && r.getInt(2) == 1)
    assertThrows[Exception] { // per-row terms cannot configure the lookup
      spark.sql(
        "SELECT term_freq_stats('a', CAST(id AS STRING)) FROM range(1)").head()
    }
  }

  test("literal-only parameters are enforced") {
    GraftExtensions.registerAll(spark)
    assertThrows[Exception] {
      // a per-row column can't configure the shingle width
      spark.sql(
        "SELECT repetition_score('a b c', CAST(id AS INT)) FROM range(1)").head()
    }
  }

  test("arity is validated") {
    GraftExtensions.registerAll(spark)
    assertThrows[Exception] {
      spark.sql("SELECT vector_dot(array(1.0D))").head()
    }
  }

  test("top_k_by_score works as a SQL aggregate") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT top_k_by_score(CAST(id % 3 AS DOUBLE), id, 2) AS t
         FROM range(9)""")
      .selectExpr("t[0].score", "t[0].id", "t[1].score", "t[1].id").head()
    // scores cycle 0,1,2 — best are score 2 at ids 2 and 5
    assert(r.getDouble(0) == 2.0 && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getLong(3) == 5L)
    assertThrows[Exception] { // k must be a literal
      spark.sql(
        "SELECT top_k_by_score(1.0, id, CAST(id AS INT)) FROM range(1)").head()
    }
  }

  test("GeoRadiusPrefilter: naive radius filter gains a pushed bbox") {
    import org.apache.spark.sql.functions._
    GraftExtensions.registerAll(spark) // installs the optimizer rule
    val dir = java.nio.file.Files.createTempDirectory("georule").toString
    val pts = spark.range(0, 2000).select(col("id"),
      ((col("id") * 37 % 17000).cast("double") / 100.0 - 85.0).as("lat"),
      ((col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).as("lon"))
    pts.write.mode("overwrite").parquet(dir)
    val naive = spark.read.parquet(dir).filter(
      functions.GeoFunctions.haversineKm(col("lat"), col("lon"),
        lit(40.0), lit(-74.0)) <= 1500.0)
    val plan = naive.queryExecution.executedPlan.toString
    // the rule injected literal lat bounds that reached the scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(lat"),
      s"bbox not pushed into the scan:\n$plan")
    // semantics: ≡ the hand-guarded idiom
    val manual = spark.read.parquet(dir).filter(
      functions.GeoFunctions.withinRadiusKm(col("lat"), col("lon"),
        40.0, -74.0, 1500.0))
    import spark.implicits._
    assert(naive.select("id").as[Long].collect().sorted.toSeq ==
      manual.select("id").as[Long].collect().sorted.toSeq)
    assert(naive.count() > 0, "gate region should be non-empty")
    // idempotent: a second application leaves the plan unchanged
    val once = graft.plans.GeoRules.GeoRadiusPrefilter(
      naive.queryExecution.optimizedPlan)
    assert(once.toString ==
      graft.plans.GeoRules.GeoRadiusPrefilter(once).toString)
  }

  test("GeoRadiusPrefilter: column-valued center is out of scope (no-op)") {
    import org.apache.spark.sql.functions._
    GraftExtensions.registerAll(spark)
    // center coordinates come from columns (the join shape) — the rule
    // must leave the plan untouched: no literal box can be folded, and
    // a per-row box would add cost without enabling scan pruning. The
    // documented path for this shape is GeoIndex/GeoJoin.
    val df = spark.range(0, 100).select(col("id"),
      (col("id") % 90).cast("double").as("lat"),
      (col("id") % 180).cast("double").as("lon"),
      (col("id") % 45).cast("double").as("clat"),
      (col("id") % 120).cast("double").as("clon"))
    val filtered = df.filter(
      functions.GeoFunctions.haversineKm(col("lat"), col("lon"),
        col("clat"), col("clon")) <= 500.0)
    val opt = filtered.queryExecution.optimizedPlan
    assert(graft.plans.GeoRules.GeoRadiusPrefilter(opt).toString ==
      opt.toString, "column-valued center must not be rewritten")
    // and no bounding-box literals appear in the executed plan
    val plan = filtered.queryExecution.executedPlan.toString
    assert(!plan.contains("-85.0") && !plan.contains("85.0") ||
      !plan.contains("GreaterThanOrEqual(lat"),
      s"unexpected prefilter on a column-centered radius:\n$plan")
  }
}
