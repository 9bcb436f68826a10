package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Partitioned Bloom prefilter in front of the exact URL-seen states
  * anti-join (north rule: "URL-seen dedup is a partitioned Bloom/cuckoo
  * filter keyed by canonicalized-URL hash ... sharded by host-hash").
  *
  * One Bloom per states bucket, persisted as a sidecar next to the states
  * manifests. Keys are the murmur3-128 seen-key of the fingerprint
  * (`SparkFun.seenKey`), probed by the native `BloomSeenProbe` expression
  * inside whole-stage codegen. A negative is a *definite* not-seen (skips
  * the exact join); a positive falls through to the exact anti-join — so
  * the URL-seen SET remains exact (the reference's dedup is exact; the
  * Bloom is purely a join-pruning device).
  *
  * Consistency (sidecars lag the states table by design):
  *  - every sidecar is stamped with the states-store version it reflects
  *    (`b<k>_CURRENT` holds the version; the engine compares it against
  *    the manifest's per-bucket last-touched version at probe time and
  *    routes buckets with absent/stale sidecars through the exact
  *    anti-join — a crash between the states commit and the sidecar
  *    write can therefore never produce a false negative)
  *  - updates are INCREMENTAL: the epoch's new keys are built into
  *    per-bucket delta blooms distributed, then merged into the loaded
  *    sidecar — cost scales with the update, not the bucket
  *
  * At 10^10 URLs: ~10^7 keys per bucket (1024 buckets) ⇒ ~12 MB/bucket at
  * 1% FPP; only the buckets an epoch actually links into are loaded.
  */
final class BloomSeen(root: String, fpp: Double = 0.01,
    expectedPerBucket: Long = 1000000L) extends Serializable {

  private def dir = Paths.get(root, "bloom")
  private def path(bucket: Int, version: Long) = dir.resolve(s"b${bucket}_v$version.bin")
  // key-format fence: v2 sidecars hold murmur128 LONG keys; pointers of
  // older builds (string keys) are ignored, so an upgraded store treats
  // them as absent → exact anti-join until the sidecars are rebuilt
  // (never a false negative from a format change)
  private def currentPath(bucket: Int) = dir.resolve(s"b${bucket}_CURRENT2")

  /** States-store version this bucket's sidecar reflects (None = never built). */
  def version(bucket: Int): Option[Long] = {
    val cur = currentPath(bucket)
    if (Files.exists(cur)) Some(Files.readString(cur).trim.toLong) else None
  }

  def load(bucket: Int): Option[BloomFilter] =
    version(bucket).map { v =>
      val in = Files.newInputStream(path(bucket, v))
      try BloomFilter.readFrom(in) finally in.close()
    }

  private def persist(bucket: Int, bloom: BloomFilter, version: Long): Unit = {
    Files.createDirectories(dir)
    val out = Files.newOutputStream(path(bucket, version))
    try bloom.writeTo(out) finally out.close()
    val tmp = dir.resolve(s"b${bucket}_CURRENT.tmp$version")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, currentPath(bucket), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Distributed per-bucket blooms over (sbucket, fingerprint) rows:
    * one partial bloom per task partition, merged per bucket. */
  private def buildPerBucket(df: DataFrame): Map[Int, BloomFilter] = {
    import df.sparkSession.implicits._
    val theFpp = fpp
    val expected = expectedPerBucket
    df.select($"sbucket", $"fingerprint").as[(Int, String)]
      .rdd
      .mapPartitions { it =>
        val blooms = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
        it.foreach { case (b, fp) =>
          blooms.getOrElseUpdate(b, BloomFilter.create(expected, theFpp))
            .putLong(graft.core.Hashing.seenKey(fp))
        }
        blooms.iterator
      }
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect().toMap
  }

  /** Full rebuild of `buckets` from the given states snapshot
    * (fingerprint, sbucket); buckets with no rows get an empty sidecar
    * so their freshness stamp still advances. */
  def rebuild(statesDf: DataFrame, buckets: Set[Int], version: Long): Unit = {
    if (buckets.isEmpty) return
    val built = buildPerBucket(statesDf)
    buckets.foreach { b =>
      persist(b, built.getOrElse(b, BloomFilter.create(expectedPerBucket, fpp)),
        version)
    }
  }

  /** Collect the epoch's delta KEYS per bucket (one Spark job over the
    * update rows) WITHOUT persisting — lets the caller run the job
    * concurrently with other epoch commits and apply it later under the
    * states commit lock. Keys, not delta Blooms: an epoch's update is
    * O(batch) keys (a few KB-MB collected), whereas building mergeable
    * delta blooms allocated a full `expectedPerBucket`-sized filter
    * (~1.2 MB) per touched bucket per task partition and shuffled those
    * filters to merge — GBs of allocation per epoch at 32×96, for a
    * result the driver immediately folds into the sidecar anyway. */
  def buildDeltas(updatesDf: DataFrame): Map[Int, Array[Long]] = {
    import updatesDf.sparkSession.implicits._
    updatesDf.select($"sbucket", $"fingerprint").as[(Int, String)]
      .rdd
      .map { case (b, fp) => (b, graft.core.Hashing.seenKey(fp)) }
      .collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Incremental update: collect the epoch's new keys (or take them
    * prebuilt) and put them into the loaded sidecars (or a fresh empty
    * bloom for first-touch buckets). Cost = O(update), not O(bucket). */
  def mergeUpdates(updatesDf: DataFrame, buckets: Set[Int], version: Long,
      prebuilt: Option[Map[Int, Array[Long]]] = None): Unit = {
    if (buckets.isEmpty) return
    val deltas = prebuilt.getOrElse(buildDeltas(updatesDf))
    buckets.foreach { b =>
      val base = load(b).getOrElse(BloomFilter.create(expectedPerBucket, fpp))
      deltas.get(b).foreach(_.foreach(base.putLong))
      persist(b, base, version)
    }
  }

  /** Broadcast the blooms for the given buckets (absent bucket = no seen
    * keys yet = everything is a definite negative). */
  def broadcastFor(spark: SparkSession, buckets: Set[Int])
      : org.apache.spark.broadcast.Broadcast[Map[Int, BloomFilter]] =
    spark.sparkContext.broadcast(
      buckets.flatMap(b => load(b).map(b -> _)).toMap)
}
