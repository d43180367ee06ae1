package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: Morton interleave golden + loud out-of-domain") {
    // a=0b101, b=0b011 → bits at 0,4 (a) and 1,3 (b) → 27
    val z = Seq((5, 3)).toDF("a", "b")
      .select(Zorder.zValue(col("a"), col("b"), 3)).as[Long].head()
    assert(z == 27L)
    // monotone tiles: (0,0) < (1,1) < (2,2) in z
    val zs = Seq((0, 0), (1, 1), (2, 2)).toDF("a", "b")
      .select(Zorder.zValue(col("a"), col("b"), 4)).as[Long].collect()
    assert(zs.sameElements(Array(0L, 3L, 12L)))
    val thrown = intercept[Exception] {
      Seq((8, 0)).toDF("a", "b")
        .select(Zorder.zValue(col("a"), col("b"), 3)).collect()
    }
    assert(thrown.getMessage.contains("out of [0, 8)"), thrown.getMessage)
    intercept[IllegalArgumentException] {
      Zorder.zValue(col("a"), col("b"), 0)
    }
  }

  test("z-ordered layout skips row groups a 1-D sort cannot") {
    // 200×200 grid; query a 2-D tile. Tiny row groups give the skip
    // granularity a real layout gets from its 128 MB groups.
    val grid = spark.range(0, 40000).select(
      (col("id") % 200).cast("int").as("x"),
      (col("id") / 200).cast("int").as("y"),
      col("id").as("payload"))
    val zdir = java.nio.file.Files.createTempDirectory("zord").toString
    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    Zorder.cluster(grid, "x", "y", zdir, bits = 8, shards = 2,
      rowGroupBytes = 16 * 1024)
    grid.repartitionByRange(2, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").option("parquet.block.size", 16 * 1024)
      .parquet(ldir)
    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("x") >= 40 && col("x") < 60 &&
          col("y") >= 40 && col("y") < 60)
      // execute THIS plan instance so its scan metrics populate
      val n = q.collect().length
      assert(n == 400, s"tile must hold 400 rows, got $n")
      q.queryExecution.executedPlan.collectLeaves().collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    }
    val (zRows, lRows) = (scannedRows(zdir), scannedRows(ldir))
    // the x-sorted layout prunes x but reads every y; z-order prunes both
    assert(zRows < lRows,
      s"z-order should read fewer rows: z=$zRows linear=$lRows")
  }
}
