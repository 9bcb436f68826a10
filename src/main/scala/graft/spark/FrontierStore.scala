package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Bucket-partitioned, manifest-committed table — Iceberg-style semantics
  * on plain parquet (this environment ships no Iceberg runtime; in
  * production these calls map 1:1 onto an Iceberg table with a
  * `bucket(N, key)` partition spec, MERGE INTO, and snapshot commits).
  *
  * Layout:
  * {{{
  * root/data/commit=V/<bucketCol>=K/part-*.parquet  (immutable once committed)
  * root/manifest/m<V>.json   — bucket -> list of leaf dirs, + counters
  * root/_CURRENT             — current manifest version (atomic rename)
  * }}}
  *
  * Scale properties:
  *  - append = add files to touched buckets only (no rewrite)
  *  - replace = rewrite only touched buckets (dequeue/merge), other
  *    buckets' files are referenced untouched by the new manifest
  *  - commit = write manifest, then atomically flip _CURRENT; a crashed
  *    epoch leaves the previous snapshot intact (resume-from-checkpoint)
  *  - per-epoch counters ride in the manifest = per-partition lineage
  */
final class BucketStore(val root: String, val bucketCol: String,
    val buckets: Int) extends Serializable {

  private def currentPath = Paths.get(root, "_CURRENT")
  private def manifestPath(v: Long) = Paths.get(root, "manifest", s"m$v.json")

  def currentVersion: Long =
    if (Files.exists(currentPath)) Files.readString(currentPath).trim.toLong else -1L

  /** manifest = (epoch, bucket -> leaf dirs, counters) */
  final case class Manifest(version: Long, epoch: Long,
      bucketPaths: Map[Int, List[String]], counters: Map[String, Long])

  def readManifest(): Manifest = {
    val v = currentVersion
    if (v < 0) return Manifest(-1, -1, Map.empty, Map.empty)
    val json = ujsonParse(Files.readString(manifestPath(v)))
    Manifest(v,
      json("epoch").toLong,
      json("buckets").obj.map { case (k, paths) =>
        k.toInt -> paths.arr.map(_.str)
      },
      json("counters").obj.map { case (k, n) => k -> n.toLong })
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
    val json = s"""{"epoch":${m.epoch},"buckets":$bucketsJson,"counters":$countersJson}"""
    Files.createDirectories(manifestPath(m.version).getParent)
    Files.writeString(manifestPath(m.version), json)
    val tmp = Paths.get(root, s"_CURRENT.tmp${m.version}")
    Files.writeString(tmp, m.version.toString)
    Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the whole table (bucket column reconstructed from dir layout). */
  def read(spark: SparkSession): DataFrame = readBuckets(spark, None)

  /** Read only the given buckets — partition pruning by construction.
    * Reads are normalized to `schema` (the epoch=… lineage dir level
    * would otherwise surface as an extra partition column). */
  def readBuckets(spark: SparkSession, only: Option[Set[Int]]): DataFrame = {
    val m = readManifest()
    val paths = m.bucketPaths
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .values.flatten.toSeq.distinct
    val schema = emptySchema.getOrElse(sys.error(s"$root: schema not set"))
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.option("basePath", s"$root/data").parquet(paths: _*)
        .select(schema.fieldNames.map(org.apache.spark.sql.functions.col(_)): _*)
  }

  /** Declared schema (also used for reads before the first commit). */
  @transient var emptySchema: Option[org.apache.spark.sql.types.StructType] = None

  private def leafDirs(epochDir: Path): Map[Int, String] = {
    if (!Files.exists(epochDir)) return Map.empty
    Files.list(epochDir).iterator.asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$bucketCol="))
      .map { p =>
        val k = p.getFileName.toString.stripPrefix(s"$bucketCol=").toInt
        k -> Paths.get(root).relativize(p).toString.replace(java.io.File.separatorChar, '/')
      }.toMap
  }

  private def writeEpochData(df: DataFrame, commitV: Long): Map[Int, String] = {
    // every commit writes a fresh immutable directory (keyed by manifest
    // version, which is strictly monotonic) — a rewrite can never clobber
    // files still referenced by the live manifest, and readers of the
    // previous snapshot stay consistent (Iceberg snapshot semantics)
    val dir = Paths.get(root, "data", s"commit=$commitV")
    require(!Files.exists(dir), s"commit dir already exists: $dir")
    // cluster by bucket before the partitioned write: one file per bucket
    // instead of (tasks × buckets) shards — file count stays flat as
    // parallelism grows
    df.repartition(org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("errorifexists").partitionBy(bucketCol).parquet(dir.toString)
    leafDirs(dir).map { case (k, rel) => k -> s"$root/$rel" }
  }

  /** Append rows (must contain bucketCol). Untouched buckets unchanged. */
  def append(df: DataFrame, epoch: Long, counters: Map[String, Long] = Map.empty): Unit = {
    val m = readManifest()
    val added = writeEpochData(df, m.version + 1)
    val merged = (m.bucketPaths.keySet ++ added.keySet).map { k =>
      k -> (m.bucketPaths.getOrElse(k, Nil) ++ added.get(k).toList)
    }.toMap
    writeManifest(Manifest(m.version + 1, epoch, merged, counters))
  }

  /** Replace the full content of the buckets present in `df` (and of
    * `alsoClear` buckets, which become empty). Other buckets untouched. */
  def replaceBuckets(df: DataFrame, epoch: Long,
      alsoClear: Set[Int] = Set.empty,
      counters: Map[String, Long] = Map.empty): Unit = {
    val m = readManifest()
    val written = writeEpochData(df, m.version + 1)
    val merged = (m.bucketPaths.keySet ++ written.keySet).flatMap { k =>
      if (written.contains(k)) Some(k -> List(written(k)))
      else if (alsoClear.contains(k)) None
      else Some(k -> m.bucketPaths(k))
    }.toMap
    writeManifest(Manifest(m.version + 1, epoch, merged, counters))
  }

  /** Atomically append to this store as part of epoch bookkeeping only
    * (counters update without data change). */
  def commitCounters(epoch: Long, counters: Map[String, Long]): Unit = {
    val m = readManifest()
    writeManifest(Manifest(m.version + 1, epoch, m.bucketPaths, counters))
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
