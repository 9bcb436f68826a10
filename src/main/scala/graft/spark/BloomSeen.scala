package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Partitioned Bloom prefilter in front of the exact URL-seen states
  * anti-join (north rule: "URL-seen dedup is a partitioned Bloom/cuckoo
  * filter keyed by canonicalized-URL hash ... sharded by host-hash").
  *
  * One Bloom per states bucket, persisted as a sidecar next to the states
  * manifests and updated for touched buckets at every states merge. At
  * link-filter time the touched buckets' blooms are broadcast and probed
  * per row: a negative is a *definite* not-seen (skips the exact join),
  * a positive falls through to the exact anti-join — so the URL-seen SET
  * remains exact (the reference's dedup is exact; the Bloom is purely a
  * join-pruning device, sized so the probe side shrinks by ~1/FPP).
  *
  * At 10^10 URLs: ~10^7 keys per bucket (1024 buckets) ⇒ ~12 MB/bucket at
  * 1% FPP; only the buckets an epoch actually links into are loaded.
  */
final class BloomSeen(root: String, fpp: Double = 0.01) extends Serializable {

  private def dir = Paths.get(root, "bloom")
  private def path(bucket: Int, version: Long) = dir.resolve(s"b${bucket}_v$version.bin")
  private def currentPath(bucket: Int) = dir.resolve(s"b${bucket}_CURRENT")

  def load(bucket: Int): Option[BloomFilter] = {
    val cur = currentPath(bucket)
    if (!Files.exists(cur)) return None
    val v = Files.readString(cur).trim.toLong
    val in = Files.newInputStream(path(bucket, v))
    try Some(BloomFilter.readFrom(in)) finally in.close()
  }

  /** Rebuild the blooms of `buckets` from the given states snapshot
    * (fingerprint, sbucket). Build is distributed (one partial bloom per
    * partition, merged per bucket); persisted with an atomic pointer
    * flip, version = the committing manifest version. */
  def rebuild(statesDf: DataFrame, buckets: Set[Int], version: Long): Unit = {
    if (buckets.isEmpty) return
    import statesDf.sparkSession.implicits._
    val theFpp = fpp
    val perBucket = statesDf
      .select($"sbucket", $"fingerprint").as[(Int, String)]
      .rdd
      .mapPartitions { it =>
        val blooms = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
        it.foreach { case (b, fp) =>
          blooms.getOrElseUpdate(b, BloomFilter.create(1000000, theFpp))
            .putString(fp)
        }
        blooms.iterator
      }
      .reduceByKey { (a, b) => a.mergeInPlace(b); a }
      .collect()
    Files.createDirectories(dir)
    perBucket.foreach { case (bucket, bloom) =>
      val out = Files.newOutputStream(path(bucket, version))
      try bloom.writeTo(out) finally out.close()
      val tmp = dir.resolve(s"b${bucket}_CURRENT.tmp$version")
      Files.writeString(tmp, version.toString)
      Files.move(tmp, currentPath(bucket), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Broadcast the blooms for the given buckets (absent bucket = no seen
    * keys yet = everything is a definite negative). */
  def broadcastFor(spark: SparkSession, buckets: Set[Int])
      : org.apache.spark.broadcast.Broadcast[Map[Int, BloomFilter]] =
    spark.sparkContext.broadcast(
      buckets.flatMap(b => load(b).map(b -> _)).toMap)
}
