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

  test("arity is validated") {
    GraftExtensions.registerAll(spark)
    assertThrows[Exception] {
      spark.sql("SELECT vector_dot(array(1.0D))").head()
    }
  }
}
