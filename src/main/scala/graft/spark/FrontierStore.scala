package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path, StandardCopyOption, StandardOpenOption}
import java.nio.channels.FileChannel
import scala.jdk.CollectionConverters._

/** Bucket-partitioned, manifest-committed table — Iceberg-style semantics
  * on plain parquet (this environment ships no Iceberg runtime; in
  * production these calls map 1:1 onto an Iceberg table with a
  * `bucket(N, key)` partition spec, MERGE INTO, and snapshot commits).
  *
  * Layout (with the optional second-level `bandCol`, used by the queue
  * for the score-banded file layout — the T3/T4 rowkey semantics,
  * reference hbase/__init__.py:129-196):
  * {{{
  * root/data/commit=V/<bucketCol>=K[/<bandCol>=B]/part-*.parquet
  * root/manifest/m<V>.json   — bucket -> leaf dirs, per-path row counts,
  *                             per-bucket last-touched version, counters
  * root/_CURRENT             — current manifest version (atomic rename)
  * }}}
  *
  * Scale properties:
  *  - append = add files to touched buckets/bands only (no rewrite)
  *  - replacePaths = rewrite only the named leaf dirs (a dequeue touches
  *    only the best score bands); other paths stay referenced untouched
  *  - commit = write manifest, then atomically flip _CURRENT; a crashed
  *    epoch leaves the previous snapshot intact (resume-from-checkpoint)
  *  - per-path row counts ride in the manifest (parquet footer stats at
  *    commit time) so a dequeue plans its band prefix without any read
  *  - commits are serialized (JVM monitor + OS file lock) and clean up
  *    orphan commit dirs from crashed writers, so a crash between the
  *    data write and the _CURRENT flip never bricks the store
  */
final class BucketStore(val root: String, val bucketCol: String,
    val buckets: Int, val bandCol: Option[String] = None,
    /** long column whose per-path MAX is tracked in the manifest from
      * the parquet footer stats (e.g. the queue's crawl_at — lets the
      * dequeue prove a scan all-visible without reading data) */
    val statCol: Option[String] = None) extends Serializable {

  private def currentPath = Paths.get(root, "_CURRENT")
  private def manifestPath(v: Long) = Paths.get(root, "manifest", s"m$v.json")

  def currentVersion: Long =
    if (Files.exists(currentPath)) Files.readString(currentPath).trim.toLong else -1L

  /** manifest = (epoch, bucket -> leaf dirs, per-path rows,
    * bucket -> last-touched version, counters, durable props).
    * `counters` are per-commit lineage; `props` carry FORWARD across
    * commits unless overwritten (Iceberg table-properties analog) — used
    * e.g. for the seed stream's last-applied-batch idempotence marker. */
  final case class Manifest(version: Long, epoch: Long,
      bucketPaths: Map[Int, List[String]], counters: Map[String, Long],
      pathRows: Map[String, Long] = Map.empty,
      bucketVersions: Map[Int, Long] = Map.empty,
      props: Map[String, String] = Map.empty,
      /** per-path max of statCol (absent = unknown, be conservative) */
      pathMax: Map[String, Long] = Map.empty)

  def readManifest(): Manifest = {
    val v = currentVersion
    if (v < 0) return Manifest(-1, -1, Map.empty, Map.empty)
    val json = ujsonParse(Files.readString(manifestPath(v)))
    Manifest(v,
      json("epoch").toLong,
      json("buckets").obj.map { case (k, paths) =>
        k.toInt -> paths.arr.map(_.str)
      },
      json("counters").obj.map { case (k, n) => k -> n.toLong },
      json.obj.get("rows").map(_.obj.map { case (k, n) => k -> n.toLong })
        .getOrElse(Map.empty),
      json.obj.get("bucketv").map(_.obj.map { case (k, n) => k.toInt -> n.toLong })
        .getOrElse(Map.empty),
      json.obj.get("props").map(_.obj.map { case (k, s) => k -> s.str })
        .getOrElse(Map.empty),
      json.obj.get("pathmax").map(_.obj.map { case (k, n) => k -> n.toLong })
        .getOrElse(Map.empty))
  }

  /** Band index of a leaf path (banded stores only); -1 marks a LEGACY
    * path written before the store was banded (no band= level) — the
    * caller must migrate it before band-pruned scans can trust it. */
  def bandOf(path: String): Int = bandCol match {
    case Some(bc) =>
      path.split('/').find(_.startsWith(s"$bc="))
        .map(_.stripPrefix(s"$bc=").toInt)
        .getOrElse(-1)
    case None => 0
  }

  // -- minimal JSON (flat, known shape) -------------------------------
  private def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private def writeManifest(m: Manifest): Unit = {
    val bucketsJson = m.bucketPaths.toSeq.sortBy(_._1).map { case (k, ps) =>
      s"${jstr(k.toString)}:[${ps.map(jstr).mkString(",")}]"
    }.mkString("{", ",", "}")
    val countersJson = m.counters.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k)}:$v"
    }.mkString("{", ",", "}")
    val rowsJson = m.pathRows.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k)}:$v"
    }.mkString("{", ",", "}")
    val bvJson = m.bucketVersions.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k.toString)}:$v"
    }.mkString("{", ",", "}")
    val propsJson = m.props.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k)}:${jstr(v)}"
    }.mkString("{", ",", "}")
    val pathMaxJson = m.pathMax.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${jstr(k)}:$v"
    }.mkString("{", ",", "}")
    val json = s"""{"epoch":${m.epoch},"buckets":$bucketsJson,"counters":$countersJson,"rows":$rowsJson,"bucketv":$bvJson,"props":$propsJson,"pathmax":$pathMaxJson}"""
    Files.createDirectories(manifestPath(m.version).getParent)
    Files.writeString(manifestPath(m.version), json)
    val tmp = Paths.get(root, s"_CURRENT.tmp${m.version}")
    Files.writeString(tmp, m.version.toString)
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the whole table (bucket column reconstructed from dir layout). */
  def read(spark: SparkSession): DataFrame = readBuckets(spark, None)

  /** Read only the given buckets — partition pruning by construction. */
  def readBuckets(spark: SparkSession, only: Option[Set[Int]]): DataFrame = {
    val m = readManifest()
    val paths = m.bucketPaths
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .values.flatten.toSeq.distinct
    readPaths(spark, paths)
  }

  /** Read only the given leaf dirs (band-pruned dequeue scans).
    * Reads are normalized to `schema` (the commit=… / band=… dir levels
    * would otherwise surface as extra partition columns); fields the
    * files predate are filled with typed nulls — additive schema
    * evolution, the Iceberg add-column semantics (a store written before
    * a column existed keeps reading after the upgrade). */
  def readPaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val schema = emptySchema.getOrElse(sys.error(s"$root: schema not set"))
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      import org.apache.spark.sql.functions.col
      // explicit schema: skips the per-read parquet schema-inference job
      // (a visible slice of the per-epoch fixed cost — each store read
      // paid one), reads bucket/band values from the partition dirs, and
      // fills fields absent from older files with typed nulls
      spark.read.option("basePath", s"$root/data").schema(schema)
        .parquet(paths: _*)
        .select(schema.fieldNames.map(col(_)): _*)
    }
  }

  /** Declared schema (also used for reads before the first commit). */
  @transient var emptySchema: Option[org.apache.spark.sql.types.StructType] = None

  private final case class LeafDir(bucket: Int, path: String, rows: Long,
      statMax: Option[Long])

  /** List a directory's entries, materialized. `Files.list` holds an open
    * DirectoryStream (one fd) until closed — leaking it per leaf dir per
    * commit exhausts the process fd limit over a long crawl (buckets ×
    * bands fds per bulkSchedule). Always close before returning. */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator.asScala.toVector finally s.close()
  }

  /** Walk the committed dir: bucket level, plus band level when banded;
    * row counts + statCol max from the parquet footers (driver-side
    * metadata only, no Spark job — the Iceberg-manifest file-stats
    * analog). */
  private def leafDirs(commitDir: Path): Seq[LeafDir] = {
    if (!Files.exists(commitDir)) return Nil
    def rel(p: Path): String =
      Paths.get(root).relativize(p).toString.replace(java.io.File.separatorChar, '/')
    val bucketDirs = listDir(commitDir)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$bucketCol="))
    val leafPaths: Seq[(Int, Path)] = bucketDirs.flatMap { bp =>
      val bucket = bp.getFileName.toString.stripPrefix(s"$bucketCol=").toInt
      val leaves = bandCol match {
        case Some(bc) =>
          listDir(bp)
            .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$bc="))
        case None => Seq(bp)
      }
      leaves.map(bucket -> _)
    }
    // footer walks are independent driver-side IO; done sequentially
    // their cost scales with leaf count (buckets × touched bands) and
    // was the dequeue commit's anti-scaling term at high partition
    // counts — run them on a bounded pool instead
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = BucketStore.footerEc
    Await.result(
      Future.traverse(leafPaths) { case (bucket, p) => Future {
        val (rows, mx) = footerStats(p)
        LeafDir(bucket, s"$root/${rel(p)}", rows, mx)
      }},
      Duration.Inf)
  }

  private def footerStats(dir: Path): (Long, Option[Long]) = {
    var rows = 0L
    var mx: Option[Long] = statCol.map(_ => Long.MinValue)
    listDir(dir)
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .foreach { p =>
        val hpath = new org.apache.hadoop.fs.Path(p.toUri)
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hpath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          rows += r.getRecordCount
          statCol.foreach { sc =>
            r.getFooter.getBlocks.forEach { block =>
              block.getColumns.forEach { cc =>
                if (cc.getPath.toDotString == sc) {
                  val st = cc.getStatistics
                  if (st == null || st.isEmpty || !st.hasNonNullValue) mx = None
                  else {
                    val v: Option[Long] = st.genericGetMax match {
                      case l: java.lang.Long => Some(l.longValue())
                      case i: java.lang.Integer => Some(i.longValue())
                      case _ => None // unknown physical type: no stat
                    }
                    mx = for (m <- mx; x <- v) yield math.max(m, x)
                  }
                }
              }
            }
          }
        } finally r.close()
      }
    (rows, mx.filter(_ != Long.MinValue))
  }

  private def writeEpochData(df: DataFrame, commitV: Long): Seq[LeafDir] = {
    // every commit writes a fresh immutable directory (keyed by manifest
    // version, which is strictly monotonic) — a rewrite can never clobber
    // files still referenced by the live manifest. A leftover dir from a
    // CRASHED commit (data written, _CURRENT never flipped) is
    // unreferenced by any manifest <= current, so it is safe to clear.
    val dir = Paths.get(root, "data", s"commit=$commitV")
    if (Files.exists(dir)) deleteRecursively(dir)
    // cluster by the partition dirs before the partitioned write: one
    // file per leaf instead of (tasks × leaves) shards — file count
    // stays flat as parallelism grows
    import org.apache.spark.sql.functions.col
    val partCols = bucketCol +: bandCol.toSeq
    df.repartition(partCols.map(col): _*)
      .write.mode("errorifexists").partitionBy(partCols: _*).parquet(dir.toString)
    leafDirs(dir)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p).foreach(deleteRecursively)
    Files.delete(p)
  }

  /** Serialize commits: JVM monitor (same-process writers, e.g. a seed
    * stream next to the epoch loop) + OS file lock (cross-process).
    * Reentrant per thread (the monitor is; the OS lock is made so via a
    * held-roots ThreadLocal) so a read-modify-write section can wrap the
    * commit it ends with. */
  private def withCommitLock[T](body: => T): T =
    if (BucketStore.heldRoots.get.contains(root)) body
    else BucketStore.monitorFor(root).synchronized {
      Files.createDirectories(Paths.get(root))
      val ch = FileChannel.open(Paths.get(root, "_commit.lock"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      val lock = ch.lock()
      BucketStore.heldRoots.get += root
      try body finally {
        BucketStore.heldRoots.get -= root
        lock.release(); ch.close()
      }
    }

  /** Hold the store's commit lock across a whole read-merge-write
    * section: a manifest snapshot taken inside is guaranteed not to be
    * invalidated by a concurrent writer before the section's own commit
    * lands (e.g. a merge-on-read fold, or a bloom-sidecar update that
    * must stay consistent with its states commit). */
  def withTableLock[T](body: => T): T = withCommitLock(body)

  /** Append rows (must contain bucketCol and, when banded, bandCol).
    * Untouched buckets unchanged. */
  def append(df: DataFrame, epoch: Long, counters: Map[String, Long] = Map.empty,
      props: Map[String, String] = Map.empty): Unit =
    withCommitLock {
      val m = readManifest()
      val v = m.version + 1
      val added = writeEpochData(df, v)
      val addedByBucket = added.groupBy(_.bucket)
      val merged = (m.bucketPaths.keySet ++ addedByBucket.keySet).map { k =>
        k -> (m.bucketPaths.getOrElse(k, Nil) ++
          addedByBucket.getOrElse(k, Nil).map(_.path))
      }.toMap
      val rows = m.pathRows ++ added.map(l => l.path -> l.rows)
      val pmax = m.pathMax ++ added.flatMap(l => l.statMax.map(l.path -> _))
      val bv = m.bucketVersions ++ addedByBucket.keySet.map(_ -> v)
      writeManifest(Manifest(v, epoch, merged, counters, rows, bv,
        m.props ++ props, pmax))
    }

  /** Replace the full content of the buckets present in `df` (and of
    * `alsoClear` buckets, which become empty). Other buckets untouched. */
  def replaceBuckets(df: DataFrame, epoch: Long,
      alsoClear: Set[Int] = Set.empty,
      counters: Map[String, Long] = Map.empty): Unit =
    withCommitLock {
      val m = readManifest()
      val v = m.version + 1
      val written = writeEpochData(df, v)
      val writtenByBucket = written.groupBy(_.bucket)
      val touched = writtenByBucket.keySet ++ alsoClear
      val merged = (m.bucketPaths.keySet ++ writtenByBucket.keySet).flatMap { k =>
        if (writtenByBucket.contains(k)) Some(k -> writtenByBucket(k).map(_.path).toList)
        else if (alsoClear.contains(k)) None
        else Some(k -> m.bucketPaths(k))
      }.toMap
      val keptPaths = merged.values.flatten.toSet
      val rows = m.pathRows.view.filterKeys(keptPaths).toMap ++
        written.map(l => l.path -> l.rows)
      val pmax = m.pathMax.view.filterKeys(keptPaths).toMap ++
        written.flatMap(l => l.statMax.map(l.path -> _))
      val bv = m.bucketVersions ++ touched.map(_ -> v)
      writeManifest(Manifest(v, epoch, merged, counters, rows, bv, m.props, pmax))
    }

  /** Replace only the named leaf dirs: the new manifest drops
    * `removePaths` and adds whatever `df` writes — the band-pruned
    * dequeue rewrite (reads N files, rewrites N files, leaves the other
    * O(queue/batch) files untouched). */
  def replacePaths(df: DataFrame, epoch: Long, removePaths: Set[String],
      counters: Map[String, Long] = Map.empty,
      props: Map[String, String] = Map.empty): Unit =
    withCommitLock {
      val m = readManifest()
      val v = m.version + 1
      val written = writeEpochData(df, v)
      val writtenByBucket = written.groupBy(_.bucket)
      val touched = writtenByBucket.keySet ++
        m.bucketPaths.collect { case (k, ps) if ps.exists(removePaths) => k }
      val merged = (m.bucketPaths.keySet ++ writtenByBucket.keySet).flatMap { k =>
        val kept = m.bucketPaths.getOrElse(k, Nil).filterNot(removePaths)
        val added = writtenByBucket.getOrElse(k, Nil).map(_.path)
        val all = kept ++ added
        if (all.isEmpty) None else Some(k -> all)
      }.toMap
      val keptPaths = merged.values.flatten.toSet
      val rows = m.pathRows.view.filterKeys(keptPaths).toMap ++
        written.map(l => l.path -> l.rows)
      val pmax = m.pathMax.view.filterKeys(keptPaths).toMap ++
        written.flatMap(l => l.statMax.map(l.path -> _))
      val bv = m.bucketVersions ++ touched.map(_ -> v)
      writeManifest(Manifest(v, epoch, merged, counters, rows, bv,
        m.props ++ props, pmax))
    }

  /** Compact leaves whose file count exceeds `maxPathsPerLeaf`: appends
    * accumulate one dir per commit in bands the dequeue never rewrites
    * (cold score bands), so file counts there grow with epoch count.
    * Compaction is manifest-driven (no data read to decide), rewrites
    * only the offending leaves, and holds the commit lock across the
    * whole read+rewrite — a concurrent dequeue/append can never commit
    * between compaction's snapshot and its rewrite (which would
    * resurrect removed rows) — it is the Iceberg `rewrite_data_files`
    * analog. Returns the number of leaves compacted. */
  def compact(spark: SparkSession, maxPathsPerLeaf: Int = 8,
      decorate: DataFrame => DataFrame = identity): Int = withCommitLock {
    val m = readManifest()
    // group leaf paths by (bucket, band); collect the overgrown groups
    val overgrown = m.bucketPaths.toSeq.flatMap { case (_, ps) =>
      ps.groupBy(bandOf).collect {
        case (_, paths) if paths.size > maxPathsPerLeaf => paths
      }
    }
    if (overgrown.isEmpty) return 0
    val paths = overgrown.flatten
    // `decorate` re-adds write-path partition columns the read drops
    // (e.g. the queue's band column, derived from score)
    val df = decorate(readPaths(spark, paths))
    replacePaths(df, m.epoch, paths.toSet,
      counters = Map("compacted_leaves" -> overgrown.size.toLong))
    overgrown.size
  }

  /** Atomically append to this store as part of epoch bookkeeping only
    * (counters/props update without data change). */
  def commitCounters(epoch: Long, counters: Map[String, Long],
      props: Map[String, String] = Map.empty): Unit =
    withCommitLock {
      val m = readManifest()
      writeManifest(Manifest(m.version + 1, epoch, m.bucketPaths, counters,
        m.pathRows, m.bucketVersions, m.props ++ props, m.pathMax))
    }

  // -- tiny JSON parser for the manifest shape we write ----------------
  private def ujsonParse(s: String): JVal = new JParser(s).parseValue()
  private[spark] sealed trait JVal {
    def obj: Map[String, JVal] = this.asInstanceOf[JObj].m
    def arr: List[JVal] = this.asInstanceOf[JArr].l
    def str: String = this.asInstanceOf[JStr].s
    def toLong: Long = this.asInstanceOf[JNum].n.toLong
    def apply(k: String): JVal = obj(k)
  }
  private[spark] case class JObj(m: Map[String, JVal]) extends JVal
  private[spark] case class JArr(l: List[JVal]) extends JVal
  private[spark] case class JStr(s: String) extends JVal
  private[spark] case class JNum(n: Double) extends JVal
  private final class JParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseValue(): JVal = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, JVal]
          if (s.charAt(i) == '}') { i += 1; return JObj(m.toMap) }
          var done = false
          while (!done) {
            ws()
            val k = parseValue().str
            ws(); require(s.charAt(i) == ':'); i += 1
            m(k) = parseValue()
            ws()
            if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == '}'); i += 1; done = true }
          }
          JObj(m.toMap)
        case '[' =>
          i += 1; ws()
          val l = scala.collection.mutable.ListBuffer.empty[JVal]
          if (s.charAt(i) == ']') { i += 1; return JArr(l.toList) }
          var done = false
          while (!done) {
            l.append(parseValue())
            ws()
            if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == ']'); i += 1; done = true }
          }
          JArr(l.toList)
        case '"' =>
          i += 1
          val sb = new StringBuilder
          while (s.charAt(i) != '"') {
            if (s.charAt(i) == '\\') { i += 1 }
            sb.append(s.charAt(i)); i += 1
          }
          i += 1
          JStr(sb.toString)
        case _ =>
          val start = i
          while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
          JNum(s.substring(start, i).toDouble)
      }
    }
  }
}

object BucketStore {
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(root: String): Object =
    monitors.computeIfAbsent(root, _ => new Object)
  /** roots whose commit lock the current thread already holds (reentrancy
    * for the OS file lock, which would otherwise throw
    * OverlappingFileLockException on same-JVM re-acquisition) */
  private val heldRoots = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }
  /** bounded pool for the commit-time parquet footer walks (driver-side
    * metadata IO, independent per leaf) */
  private[spark] val footerEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(16,
        r => { val t = new Thread(r, "graft-footer"); t.setDaemon(true); t }))
}
