package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Thrown when a writer holding a stale [[WriterEpoch]] touches a store
  * a newer writer has since claimed — the zombie-writer guard. The
  * fenced process must stop; resuming requires a deliberate restart
  * (which acquires a fresh, higher epoch).
  */
final class FencedWriterException(msg: String) extends RuntimeException(msg)

/** A writer's claim on a store, acquired once per writer session via
  * [[DeltaLog.acquireEpoch]] and checked at every mutation point. A
  * strictly higher epoch — or the same epoch with a lexicographically
  * smaller token, the deterministic tie-break when two writers race the
  * same number — fences this one.
  */
final case class WriterEpoch(domain: String, epoch: Int, token: String)

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
  * path and turns that contract violation into a loud failure — and the
  * contract itself is ENFORCED by writer fencing: each writer session
  * registers a [[WriterEpoch]] in the store's `_epochs` ledger, and
  * every mutation point re-checks it, so a zombie writer (stale driver
  * retry, orphaned job) dies with [[FencedWriterException]] at its next
  * touch instead of interleaving commits or GC'ing a generation a live
  * writer's readers lease. All of a store's mutation paths must share
  * ONE fence domain (the store's root dir — pass `fenceDomain = dir`
  * everywhere, including [[migrateLegacy]]); split domains fence only
  * the op types the live writer has already exercised.
  */
private[sink] object DeltaLog {

  /** Zero-byte sentinel sealing a commit directory; written LAST, after
    * the rename, so its presence proves every data object is in place.
    */
  val CommitMarker = "_COMMITTED"

  /** Run the independent leg writes of ONE commit/install body
    * concurrently (optimization guide §2.6: Spark happily runs several
    * jobs at once inside one application — actions are only sequential
    * because the driver calls them sequentially). A store commit writes
    * 2–4 small independent legs (postings/norms/positional/docs,
    * cells/docs, …) into the SAME pre-rename temp dir; serializing them
    * leaves the cluster idle during each leg's tail. Every leg is always
    * awaited — even when one fails — so the caller's cleanup can never
    * race a still-running leg's writes; the first failure is rethrown
    * after the barrier.
    */
  private[sink] def inParallel(legs: (() => Unit)*): Unit = {
    if (legs.sizeIs <= 1) { legs.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(legs.size)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = legs.map { l =>
        new java.util.concurrent.Callable[Option[Throwable]] {
          def call(): Option[Throwable] =
            try { l(); None } catch { case e: Throwable => Some(e) }
        }
      }
      // invokeAll blocks until EVERY leg finished (success or failure).
      // r18 (advisor): that guarantee does NOT survive interruption —
      // an interrupted invokeAll cancels unfinished tasks and throws
      // immediately, and get() can throw CancellationException past the
      // Option collection. The catch below restores the barrier: wait
      // out every already-RUNNING leg (shutdownNow + awaitTermination;
      // queued-but-unstarted tasks are cancelled, which is safe — they
      // never touched the filesystem) before propagating, so commit
      // cleanup can never race a still-writing leg.
      val outcomes =
        try pool.invokeAll(tasks.asJava).asScala.map(_.get())
        catch {
          case e @ (_: InterruptedException |
              _: java.util.concurrent.CancellationException) =>
            pool.shutdownNow()
            // bounded patience: a wedged leg shouldn't hang shutdown
            // forever, but a healthy parquet write gets to finish
            pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
            Thread.currentThread().interrupt()
            throw e
        }
      outcomes.flatten.headOption.foreach(e => throw e)
    } finally pool.shutdown()
  }

  /** Root-level sentinel: every numbered dir under this root that needs
    * adopting has been adopted (see [[legacyAdoptable]]), and every LATER
    * marker-less dir is a torn/crashed commit, never a legacy one.
    * Written by readers after a completed adoption sweep, and by
    * [[commit]] BEFORE its rename — so while any marker-gated commit is
    * in flight the sentinel already exists and no reader will mistake
    * its mid-copy directory for a legacy commit and seal it early.
    */
  val AdoptedMarker = "_PROTOCOL_MARKERS"

  /** Intent sentinel for the write path's legacy-adoption sweep: written
    * BEFORE the first legacy dir is sealed, removed after [[AdoptedMarker]]
    * lands. Its presence with [[AdoptedMarker]] absent proves a sweep
    * crashed mid-way — and, because the sweep only ever starts on a
    * zero-sealed-commits root and this writer renames nothing before
    * [[AdoptedMarker]] exists, every marker-less numeric dir in that state
    * is still a pre-marker legacy commit: the sweep is safely RESUMED
    * (by the next write, and in memory by reads) instead of the root
    * being misread as an ambiguous mixed upgrade and the unsealed
    * remainder silently orphaned.
    */
  val AdoptingMarker = "_ADOPTING"

  def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- writer fencing --------------------------------------------------
  //
  // Single-writer was previously TRUST-BASED outside the post-rename
  // clobber check: a zombie writer (stale driver retry, orphaned job)
  // could interleave commits/installs with a live writer, or GC a base
  // generation the live writer's readers lease. The epoch ledger makes
  // it enforced: a writer session registers an epoch file under
  // `$domain/_epochs` at its first mutation; every later PUT point
  // re-lists the ledger and fails loudly ([[FencedWriterException]])
  // the moment a higher claim exists. Object stores have no
  // compare-and-swap, so a check-then-PUT window remains (a rival that
  // acquires between a writer's final check and its sealing PUT is not
  // caught by the check itself) — but the rival acquires BEFORE its
  // first list of the log, so anything the zombie sealed earlier is in
  // the rival's view, and the zombie's NEXT touch dies. This is the
  // standard fencing bound (cf. Kafka producer epochs, HDFS lease
  // recovery) and shrinks the unbounded trust window to one in-flight
  // marker PUT.

  /** Directory under the fence domain holding one zero-byte claim file
    * per writer session: `e-<epoch%09d>-<token>`.
    */
  val EpochDir = "_epochs"

  private val epochPat = "e-(\\d+)-(.+)".r

  /** Parsed claims plus the names of DAMAGED entries (epoch-shaped files
    * whose number overflows Int — corrupt or foreign; legitimate epochs
    * are %09d-formatted Ints). The two callers treat damage opposingly,
    * by design:
    *  - [[acquireEpoch]] (the restart path) SKIPS damaged entries with a
    *    loud once-per-JVM warning — a damaged file must not brick every
    *    future writer start; the operator deletes it at leisure.
    *  - [[checkFence]] (the live-writer mutation guard) treats ANY
    *    damaged entry as FENCING — fail-safe: a damaged-but-higher claim
    *    that the skip made invisible would otherwise open a fencing hole
    *    (two live writers). The fenced writer's error names the file;
    *    deleting it and restarting (which re-acquires) restores writes.
    */
  private def listEpochs(f: org.apache.hadoop.fs.FileSystem,
      domain: String): (Seq[(Int, String)], Seq[String]) = {
    val p = new Path(s"$domain/$EpochDir")
    if (!f.exists(p)) (Seq.empty, Seq.empty)
    else {
      val (ok, bad) = (Seq.newBuilder[(Int, String)], Seq.newBuilder[String])
      f.listStatus(p).foreach(_.getPath.getName match {
        case epochPat(n, t) => n.toIntOption match {
          case Some(e) => ok += ((e, t))
          case None => bad += s"$domain/$EpochDir/e-$n-$t"
        }
        case _ => ()
      })
      (ok.result(), bad.result())
    }
  }
  private val badEpochWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def warnDamaged(files: Seq[String]): Unit = files.foreach { file =>
    if (badEpochWarned.add(file)) System.err.println(
      s"[DeltaLog] ignoring unparseable epoch ledger entry $file " +
        "(epoch number outside Int range — corrupt or foreign file; " +
        "delete it to silence this warning)")
  }

  /** Register this writer session's claim on `domain` (a store's root
    * directory): PUT an epoch file numbered past every existing claim,
    * then re-list — if the re-list shows a strictly higher claim, or the
    * same number with a smaller token (two writers raced the same
    * number; the smaller token deterministically wins), this writer lost
    * the race and fails at birth. Claims older than the newest
    * [[EpochKeep]] are GC'd here (never the maximum — that is what
    * fences the zombies).
    */
  def acquireEpoch(spark: SparkSession, domain: String): WriterEpoch = {
    val f = fs(spark, domain)
    f.mkdirs(new Path(s"$domain/$EpochDir"))
    val (before, damaged0) = listEpochs(f, domain)
    warnDamaged(damaged0)
    val n = (before.map(_._1) :+ 0).max + 1
    val token = java.util.UUID.randomUUID().toString
    f.create(new Path(f"$domain/$EpochDir/e-$n%09d-$token"), true).close()
    val (after, damaged1) = listEpochs(f, domain)
    warnDamaged(damaged1)
    if (after.exists { case (m, t) => m > n || (m == n && t < token) })
      throw new FencedWriterException(
        s"writer lost the epoch-$n race at $domain/$EpochDir — " +
          "another writer claimed this store concurrently")
    val stale = after.map(_._1).distinct.sorted.dropRight(EpochKeep).toSet
    after.filter(e => stale.contains(e._1)).foreach { case (m, t) =>
      f.delete(new Path(f"$domain/$EpochDir/e-$m%09d-$t"), false): Unit
    }
    WriterEpoch(domain, n, token)
  }

  private val EpochKeep = 8

  /** Fail loudly if a claim newer than `we` exists — called at every
    * mutation point of [[commit]] / [[installBase]] / [[migrateLegacy]].
    */
  def checkFence(spark: SparkSession, we: WriterEpoch): Unit = {
    val (claims, damaged) = listEpochs(fs(spark, we.domain), we.domain)
    // fail-SAFE on ledger damage: an unparseable entry could be a
    // damaged-but-higher rival claim — invisible-if-skipped would mean
    // two live writers. The writer stops; the error names the file
    // (delete it, restart — acquireEpoch deliberately skips damage so
    // the restart succeeds).
    if (damaged.nonEmpty)
      throw new FencedWriterException(
        s"writer epoch ${we.epoch} at ${we.domain} stopping on " +
          s"unparseable epoch ledger entries (${damaged.mkString(", ")}) " +
          "— a damaged entry could be a newer rival's claim, so writes " +
          "fail safe. Delete the named file(s), then restart the writer " +
          "(restart re-acquires an epoch; acquisition itself skips " +
          "damage, so a stray file can never brick the restart).")
    val newest = claims
      .filter { case (m, t) => m > we.epoch || (m == we.epoch && t < we.token) }
    if (newest.nonEmpty)
      throw new FencedWriterException(
        s"writer epoch ${we.epoch} is fenced by epoch " +
          s"${newest.map(_._1).max} at ${we.domain} — a newer writer owns " +
          "this store; this process must stop (restart acquires a fresh " +
          "epoch). README: 'Operating the fenced stores'.")
  }

  /** One epoch per (JVM, store): the production stores call [[commit]] /
    * [[installBase]] statically, so the writer "session" is the JVM —
    * the first mutation acquires, every later one reuses and re-checks.
    * Tests simulating rival writers pass explicit [[WriterEpoch]]s
    * instead.
    */
  private val sessionEpochs =
    new java.util.concurrent.ConcurrentHashMap[String, WriterEpoch]()
  private[sink] def resolveEpoch(spark: SparkSession, domain: String,
      explicit: WriterEpoch): WriterEpoch =
    if (explicit != null) explicit
    else sessionEpochs.computeIfAbsent(domain, d => acquireEpoch(spark, d))

  /** Test hook: forget this JVM's cached claim so the next mutation
    * re-acquires (simulates a writer restart).
    */
  private[sink] def clearSessionEpoch(domain: String): Unit =
    sessionEpochs.remove(domain): Unit

  /** Seal a freshly-created commit root as already-adopted: every store
    * calls this at CREATION, so a root born under the marker protocol
    * never runs the legacy-adoption sweep — without it, a crash during
    * the root's very first commit would leave a marker-less dir that a
    * reader could not distinguish from a legacy commit.
    */
  def initRoot(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    f.create(new Path(s"$root/$AdoptedMarker"), true).close()
  }

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

  /** Structural completeness of a candidate legacy commit dir: the
    * store's always-present payload child exists, nothing `.tmp`-nested
    * does, every `*.parquet` file below it carries the PAR1 magic at
    * BOTH ends (a zero-byte or truncated file never adopts), and any
    * Spark-written payload child (one with `part-*` files) carries its
    * `_SUCCESS` commit marker. Defense in depth for the adoption paths
    * below — a torn object-store copy of a LEGACY commit (some objects
    * missing, each present object whole) cannot be detected from
    * content alone, which is exactly why automatic adoption is
    * restricted to the unambiguous case and everything else goes
    * through [[migrateLegacy]].
    */
  private def legacyComplete(f: org.apache.hadoop.fs.FileSystem,
      dir: Path, markerChild: String): Boolean = {
    val kids = f.listStatus(dir).toSeq
    val names = kids.map(_.getPath.getName)
    if (!names.contains(markerChild) || names.exists(_.startsWith(".tmp")))
      return false
    val stack = scala.collection.mutable.Stack(kids.filter(_.isDirectory): _*)
    val magic = Array[Byte]('P', 'A', 'R', '1')
    while (stack.nonEmpty) {
      val d = stack.pop()
      val inner = f.listStatus(d.getPath).toSeq
      stack.pushAll(inner.filter(_.isDirectory))
      val files = inner.filterNot(_.isDirectory)
      if (files.exists(_.getPath.getName.startsWith("part-")) &&
          !files.exists(_.getPath.getName == "_SUCCESS")) return false
      for (st <- files if st.getPath.getName.endsWith(".parquet")) {
        if (st.getLen < 12) return false
        val in = f.open(st.getPath)
        try {
          val head = new Array[Byte](4)
          val tail = new Array[Byte](4)
          in.readFully(0, head)
          in.readFully(st.getLen - 4, tail)
          if (!java.util.Arrays.equals(head, magic) ||
              !java.util.Arrays.equals(tail, magic)) return false
        } finally in.close()
      }
    }
    true
  }

  /** Marker-less numeric dirs that are UNAMBIGUOUSLY pre-marker legacy
    * commits — computed without writing anything. The rule: adopt only
    * when the root holds ZERO sealed commits. [[commit]] seals the root
    * with [[AdoptedMarker]] before its very first rename, so a root
    * where a marker-era commit ever ran carries the sentinel (and this
    * sweep never fires); a root with sealed commits but no sentinel is
    * a mid-upgrade mix whose marker-less dirs may be CRASHED marker-era
    * commits — a crash between rename and seal leaves a complete-looking
    * dir whose batch was then retried under a fresh seq, so adopting it
    * double-counts (additive stores like StatsStore would inflate
    * silently). That ambiguous case is never auto-adopted; it takes the
    * operator-asserted [[migrateLegacy]]. (This is deliberately stricter
    * than a below-highest-sealed-seq bound: a crashed commit RETRIED and
    * sealed under a later seq sits below that bound and would still
    * double-count.)
    */
  private def legacyAdoptable(spark: SparkSession, root: String,
      markerChild: String): Seq[Int] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root)) ||
        f.exists(new Path(s"$root/$AdoptedMarker"))) return Seq.empty
    val nums = numericSeqs(spark, root)
    val sealedSet = nums.filter(s =>
      f.exists(new Path(s"$root/$s/$CommitMarker"))).toSet
    // [[AdoptingMarker]] present = a sweep crashed mid-way; the seals it
    // already wrote don't make the root ambiguous — resume over the rest
    val resuming = f.exists(new Path(s"$root/$AdoptingMarker"))
    if (sealedSet.nonEmpty && !resuming) Seq.empty
    else nums.filterNot(sealedSet)
      .filter(s => legacyCompleteCached(f, s"$root/$s", markerChild))
  }

  /** [[legacyComplete]] with a per-JVM positive cache: a dir that passed
    * the deep scan is immutable-once-written (legacy commits are never
    * rewritten), so repeated reads of an unmigrated legacy root — every
    * listSeqs call on a read-only deployment re-runs the sweep — pay the
    * O(files) parquet-magic round-trips once, not per read. Negative
    * results are NOT cached (an in-flight copy may complete later), and
    * the key carries a RECURSIVE fingerprint of the dir — every nested
    * file's (path, len, mtime), gathered from listStatus alone, no file
    * opens — so a nested file later truncated/replaced, or a RECYCLED
    * path (a root torn down outside the protocol and rebuilt with the
    * same seq numbers), re-scans rather than trusting the old verdict.
    * The fingerprint walk is O(directories) metadata round-trips; the
    * deep scan it caches additionally OPENS every parquet file twice,
    * so the cache still pays for itself on every re-read.
    */
  // keyed by (dir, markerChild) holding the LAST verified fingerprint —
  // a tree change supersedes the old entry instead of stranding it
  // forever (the Set-of-composite-keys shape grew one dead entry per
  // tree change, unbounded on slowly-mutating unadopted roots)
  private val legacyCompleteCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dirFingerprint(f: org.apache.hadoop.fs.FileSystem,
      dir: Path): String = {
    val sb = new StringBuilder
    // PATHS RELATIVE TO THE ROOT, not bare names: name-only digests
    // collide across structurally different trees (a file moved
    // between nesting levels keeps its name/len/mtime triple), and a
    // collision here would reuse a stale legacy-complete verdict
    val rootLen = f.makeQualified(dir).toString.length
    val stack = scala.collection.mutable.Stack(dir)
    while (stack.nonEmpty) {
      val d = stack.pop()
      f.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
        sb.append(f.makeQualified(st.getPath).toString.drop(rootLen))
          .append('#').append(st.getLen)
          .append('#').append(st.getModificationTime).append(';')
        if (st.isDirectory) stack.push(st.getPath)
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    java.util.Base64.getEncoder.encodeToString(
      md.digest(sb.toString.getBytes("UTF-8")))
  }
  private def legacyCompleteCached(f: org.apache.hadoop.fs.FileSystem,
      dir: String, markerChild: String): Boolean = {
    val fp =
      try dirFingerprint(f, new Path(dir))
      catch { case _: java.io.FileNotFoundException => return false }
    val key = s"$dir#$markerChild"
    legacyCompleteCache.get(key) == fp ||
      (legacyComplete(f, new Path(dir), markerChild) && {
        legacyCompleteCache.put(key, fp); true
      })
  }

  /** Explicit migration for a store upgraded from the pre-marker
    * protocol: seals every marker-less numeric dir with `seq <= upToSeq`
    * that passes the completeness check, then seals the root with
    * [[AdoptedMarker]]. The OPERATOR asserts the bound — `upToSeq` must
    * be the store's last pre-marker commit (everything above it that
    * lacks a marker is a crashed marker-era commit and stays invisible).
    * Run offline with the single writer stopped, with write credentials.
    * Returns the seqs sealed. The automatic read path only ever adopts
    * the unambiguous zero-sealed-commits case (see [[legacyAdoptable]]);
    * this is the path for everything else. Crash recovery: a crash
    * mid-migration leaves some dirs sealed and no [[AdoptedMarker]] —
    * simply RE-RUN migrateLegacy with the same bound (sealing is
    * idempotent; already-sealed dirs are skipped). The automatic resume
    * sentinel ([[AdoptingMarker]]) is deliberately NOT used here: it
    * would resume without the operator's upToSeq bound.
    * `fenceDomain` is the store's fence domain — the SAME one its
    * writers pass to [[commit]]/[[installBase]] (the store dir for the
    * production stores) — so the fresh epoch acquired here actually
    * fences a zombie writer; it is required, not defaulted, because
    * defaulting to the commit root would silently split the domain.
    */
  def migrateLegacy(spark: SparkSession, root: String, markerChild: String,
      upToSeq: Int, fenceDomain: String): Seq[Int] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) return Seq.empty
    // acquire a FRESH claim (not the session's): migration asserts the
    // single writer is stopped — registering a new epoch makes that
    // enforced, fencing any zombie still holding the old one. The
    // fence domain is REQUIRED (no root default): it must be the SAME
    // domain the store's writers check — the store dir, not the commit
    // root — or the fresh epoch fences nobody (the split-domain hazard
    // the class doc warns about).
    val we = acquireEpoch(spark, fenceDomain)
    sessionEpochs.put(we.domain, we) // this JVM now owns the store
    val adoptable = numericSeqs(spark, root).filter(s =>
      s <= upToSeq && !f.exists(new Path(s"$root/$s/$CommitMarker")) &&
        legacyCompleteCached(f, s"$root/$s", markerChild))
    adoptable.foreach(s =>
      f.create(new Path(s"$root/$s/$CommitMarker"), true).close())
    checkFence(spark, we)
    f.create(new Path(s"$root/$AdoptedMarker"), true).close()
    adoptable
  }

  /** COMMITTED sequence numbers under `root`, ascending: numeric dirs
    * sealed by [[CommitMarker]]. Skips in-flight `.tmp-*` dirs, strays
    * (non-numeric names), and marker-less dirs — the latter are torn or
    * crashed commits a reader must never consume (their writer either
    * died before sealing, or an object-store copy is still in flight).
    *
    * Pass `adoptChild` (the store's always-present payload child) to
    * also admit pre-marker LEGACY commits — READ-ONLY: the adopted view
    * is computed in memory ([[legacyAdoptable]] — only the unambiguous
    * zero-sealed-commits case), so readers with read-only credentials
    * keep working and a reader can never seal another writer's mid-copy
    * dir. Markers are persisted by the write path ([[commit]] sweeps
    * before its first rename) or by the explicit [[migrateLegacy]].
    * TOCTOU guard: if [[AdoptedMarker]] appears DURING the in-memory
    * sweep (a marker-era writer's pre-rename PUT — its rename may have
    * torn our listing), the adopted view is discarded and the strict
    * marker-gated view is re-taken.
    */
  def listSeqs(spark: SparkSession, root: String,
      adoptChild: Option[String] = None): Seq[Int] = {
    val f = fs(spark, root)
    def sealedView(): Seq[Int] = numericSeqs(spark, root)
      .filter(s => f.exists(new Path(s"$root/$s/$CommitMarker")))
    adoptChild match {
      case Some(c) if f.exists(new Path(root)) &&
          !f.exists(new Path(s"$root/$AdoptedMarker")) =>
        val adopted = legacyAdoptable(spark, root, c)
        if (f.exists(new Path(s"$root/$AdoptedMarker"))) sealedView()
        else (adopted ++ sealedView()).distinct.sorted
      case _ => sealedView()
    }
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
      markerChild: String, fenceDomain: String,
      epoch: WriterEpoch = null)(write: String => Unit): Int = {
    // REQUIRED, like migrateLegacy's: a store's commit root is usually
    // `$dir/commits`, a CHILD of the fence domain — defaulting to the
    // root here silently split the domain (zombie commits unfenced by a
    // rival's epoch on the store dir, the class-doc hazard)
    require(fenceDomain != null && fenceDomain.nonEmpty,
      "commit() needs the store's fence domain (the store root dir — " +
        "the SAME domain every other mutation of this store checks)")
    val we = resolveEpoch(spark, fenceDomain, epoch)
    checkFence(spark, we) // early out before burning the write
    val tmp = s"$root/.tmp-$seq"
    write(tmp)
    val f = fs(spark, root)
    // re-check AFTER the (possibly long) write, BEFORE anything becomes
    // visible — a fenced commit leaves only an invisible `.tmp-*` stray
    checkFence(spark, we)
    // legacy sweep + AdoptedMarker PUT strictly BEFORE the rename: once
    // any marker-gated commit is in flight the root is sealed as
    // adopted, so no reader's in-memory adoption can admit our mid-copy
    // dir. The WRITER persists the markers (single-writer contract — no
    // racing writer whose crash this could seal — and it evidently has
    // write credentials); only the unambiguous zero-sealed-commits case
    // auto-adopts, the mixed case takes [[migrateLegacy]].
    if (!f.exists(new Path(s"$root/$AdoptedMarker"))) {
      val adoptable = legacyAdoptable(spark, root, markerChild)
      // intent BEFORE the first seal: a crash mid-sweep leaves the
      // sentinel, so the next write (and every read) RESUMES the sweep
      // instead of misreading the half-sealed root as an ambiguous
      // mixed upgrade and orphaning the unsealed remainder
      if (adoptable.nonEmpty)
        f.create(new Path(s"$root/$AdoptingMarker"), true).close()
      adoptable.foreach(s =>
        f.create(new Path(s"$root/$s/$CommitMarker"), true).close())
      f.create(new Path(s"$root/$AdoptedMarker"), true).close()
      f.delete(new Path(s"$root/$AdoptingMarker"), false): Unit
    } else
      // a crash between AdoptedMarker and the intent delete leaves a
      // harmless stray intent — clear it (no-op when absent)
      f.delete(new Path(s"$root/$AdoptingMarker"), false): Unit
    val dest = new Path(s"$root/$seq")
    require(f.rename(new Path(tmp), dest),
      s"could not commit delta $seq (concurrent writer?)")
    val ok = f.exists(new Path(dest, markerChild)) &&
      !f.listStatus(dest).exists(_.getPath.getName.startsWith(".tmp"))
    require(ok, s"delta $seq commit was clobbered by a concurrent writer " +
      "(this index is single-writer; serialize commits upstream)")
    // final check before the sealing PUT: a commit fenced here stays an
    // unsealed renamed dir — the crashed-commit shape readers never admit
    checkFence(spark, we)
    f.create(new Path(dest, CommitMarker), true).close()
    seq
  }

  // ---- versioned, marker-gated BASE directories ------------------------
  //
  // The compacted base has the same object-store problem the commit log
  // had: the old protocol installed a freshly-written `.X-next` via TWO
  // DIRECTORY RENAMES, and on S3A a directory rename is a non-atomic
  // copy+delete — a reader resolving the base mid-swap saw a missing or
  // PARTIAL base. The versioned protocol never renames a directory:
  // each generation is written IN PLACE as `$dir/$name-v<N>`, sealed by
  // [[CommitMarker]] as the final single-object PUT, and readers resolve
  // the highest SEALED generation. The newest `keepGenerations` previous
  // sealed generations are kept so a reader that resolved its base
  // before recent installs keeps a complete directory to scan; older
  // ones are GC'd. A crashed install leaves an unsealed generation that
  // readers never see and whose number is never reused.

  private def baseVersions(spark: SparkSession, dir: String,
      name: String): Seq[(Int, Boolean)] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    val pat = (java.util.regex.Pattern.quote(name) + "-v(\\d+)").r
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case pat(n) =>
          Some((n.toInt,
            f.exists(new Path(st.getPath, CommitMarker))))
        case _ => None
      }).sortBy(_._1)
  }

  /** The CURRENT base directory for `name` under `dir`: the highest
    * sealed `$name-v<N>` generation, falling back to the legacy bare
    * `$dir/$name` layout for stores written before the versioned
    * protocol (generation 0).
    */
  def currentBase(spark: SparkSession, dir: String, name: String): String =
    baseVersions(spark, dir, name).filter(_._2).lastOption match {
      case Some((v, _)) => s"$dir/$name-v$v"
      case None => s"$dir/$name"
    }

  /** Install a new base generation: run `write` against the next
    * versioned path (PAST every existing generation, sealed or not, so
    * a crashed install never collides), seal it with [[CommitMarker]],
    * then GC all but the newest `keepGenerations` PREVIOUS sealed
    * generations (unsealed crashed strays go immediately — no reader
    * ever resolves one; the legacy bare dir counts as the oldest
    * readable generation and goes once `keepGenerations` sealed
    * versioned generations precede this install). Returns the new base
    * path; visibility is the marker PUT — no directory is ever renamed.
    *
    * READER-LEASE BOUND: a reader that resolved [[currentBase]] stays
    * complete across at most `keepGenerations` subsequent installs —
    * size it to (longest expected scan) / (shortest compaction
    * interval). The default 1 covers one compaction; a multi-hour query
    * over a busy store needs a larger window (each retained generation
    * costs one full base copy of storage).
    */
  def installBase(spark: SparkSession, dir: String, name: String,
      keepGenerations: Int = 1, fenceDomain: String,
      epoch: WriterEpoch = null)(write: String => Unit): String = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1, got $keepGenerations")
    // required like commit()'s: for the production stores this IS `dir`,
    // but spelling it at the call site keeps a future multi-store root
    // from silently splitting the fence domain
    require(fenceDomain != null && fenceDomain.nonEmpty,
      "installBase() needs the store's fence domain (the store root " +
        "dir — the SAME domain every other mutation of this store checks)")
    val we = resolveEpoch(spark, fenceDomain, epoch)
    checkFence(spark, we)
    val f = fs(spark, dir)
    val versions = baseVersions(spark, dir, name)
    val v = (versions.map(_._1) :+ 0).max + 1
    val path = s"$dir/$name-v$v"
    write(path)
    // before the sealing PUT: a fenced install stays an unsealed
    // generation no reader resolves and whose number is never reused
    checkFence(spark, we)
    f.create(new Path(s"$path/$CommitMarker"), true).close()
    // before GC: a fenced writer must never delete a generation the
    // live writer's readers lease
    checkFence(spark, we)
    val sealedPrev = versions.filter(_._2).map(_._1)
    val retained = sealedPrev.takeRight(keepGenerations).toSet
    versions.map(_._1).filter(o => !retained.contains(o))
      .foreach(o => f.delete(new Path(s"$dir/$name-v$o"), true))
    if (sealedPrev.size >= keepGenerations)
      f.delete(new Path(s"$dir/$name"), true)
    // stray temp dirs from the retired rename protocol
    f.delete(new Path(s"$dir/.$name-next"), true)
    f.delete(new Path(s"$dir/.$name-old"), true)
    path
  }
}
