package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The shared commit protocol of the incrementally-maintained indexes
  * ([[IncrementalPostings]], [[VectorIndex]], [[SignatureStore]],
  * [[GeoIndex]], [[StatsStore]]): a log of numbered delta directories
  * under a root, each written under a dot-prefixed temp name, renamed
  * into place, then SEALED by a zero-byte [[CommitMarker]] sentinel
  * written as the final operation.
  *
  * The marker — not the rename — is what readers gate on. Directory
  * rename is atomic on local FS/HDFS, but on object stores (S3A, the
  * engine's declared 100 TB substrate) "rename" is a non-atomic
  * copy+delete: a reader listing the log mid-copy would see the commit
  * directory with PARTIAL contents. A single-object PUT is atomic
  * everywhere, and the sentinel is only written once every data object
  * exists at its final path — so [[listSeqs]] admitting only
  * marker-sealed commits makes a torn copy invisible, matching the
  * reference's nothing-visible-until-the-barrier-completes contract
  * (PaimonIngestor.java:341-368).
  *
  * Single-writer contract (one ingest pipeline per index, like the
  * reference): Hadoop's directory rename is not a compare-and-swap
  * everywhere — on HDFS/S3A renaming onto an EXISTING directory moves
  * the source INTO it and still returns true, silently swallowing a
  * racing committer. [[commit]] verifies OUR data landed at the final
  * path and turns that contract violation into a loud failure.
  */
private[sink] object DeltaLog {

  /** Zero-byte sentinel sealing a commit directory; written LAST, after
    * the rename, so its presence proves every data object is in place.
    */
  val CommitMarker = "_COMMITTED"

  def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every numeric delta dir under `root`, sealed or not — the writer's
    * view, used only to pick fresh sequence numbers so a crashed
    * (marker-less) commit's number is never reused.
    */
  private def numericSeqs(spark: SparkSession, root: String): Seq[Int] = {
    val p = new Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toInt).sorted
  }

  /** COMMITTED sequence numbers under `root`, ascending: numeric dirs
    * sealed by [[CommitMarker]]. Skips in-flight `.tmp-*` dirs, strays
    * (non-numeric names), and marker-less dirs — the latter are torn or
    * crashed commits a reader must never consume (their writer either
    * died before sealing, or an object-store copy is still in flight).
    */
  def listSeqs(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    numericSeqs(spark, root)
      .filter(s => f.exists(new Path(s"$root/$s/$CommitMarker")))
  }

  /** Next fresh sequence: past ALL numeric dirs, sealed or not — reusing
    * a crashed commit's number would rename INTO its leftover directory.
    */
  def nextSeq(spark: SparkSession, root: String): Int =
    (numericSeqs(spark, root) :+ 0).max + 1

  /** Run `write` against the temp path for `seq`, rename it into place,
    * verify the rename placed OUR commit there (`markerChild` must exist
    * directly under the final path, and nothing `.tmp`-nested may — the
    * signature of a swallowed concurrent rename), then seal the commit
    * with [[CommitMarker]] as the LAST write. Readers admit the commit
    * only once the sentinel exists. Returns `seq`.
    */
  def commit(spark: SparkSession, root: String, seq: Int,
      markerChild: String)(write: String => Unit): Int = {
    val tmp = s"$root/.tmp-$seq"
    write(tmp)
    val f = fs(spark, root)
    val dest = new Path(s"$root/$seq")
    require(f.rename(new Path(tmp), dest),
      s"could not commit delta $seq (concurrent writer?)")
    val ok = f.exists(new Path(dest, markerChild)) &&
      !f.listStatus(dest).exists(_.getPath.getName.startsWith(".tmp"))
    require(ok, s"delta $seq commit was clobbered by a concurrent writer " +
      "(this index is single-writer; serialize commits upstream)")
    f.create(new Path(dest, CommitMarker), true).close()
    seq
  }

  /** Complete a base swap interrupted between its two renames: if `base`
    * is missing but a fully-written `next` exists, install it and clear
    * the old-base leftover. Idempotent; called before every read and
    * compact so a crash never leaves the index unreadable.
    */
  def recoverBase(spark: SparkSession, base: String, next: String,
      old: String): Unit = {
    val f = fs(spark, base)
    val b = new Path(base)
    val n = new Path(next)
    if (!f.exists(b) && f.exists(n)) {
      require(f.rename(n, b), s"recovery: could not install $next")
      f.delete(new Path(old), true)
    }
  }

  /** Swap a freshly-written `next` in as `base` (old base → `old`,
    * deleted after the install). The window between the two renames is
    * healed by [[recoverBase]].
    */
  def swapBase(spark: SparkSession, base: String, next: String,
      old: String): Unit = {
    val f = fs(spark, base)
    val o = new Path(old)
    f.delete(o, true) // leftovers from a prior interrupted swap
    require(f.rename(new Path(base), o), "compact: base swap failed")
    require(f.rename(new Path(next), new Path(base)),
      "compact: base install failed")
    f.delete(o, true)
  }
}
