package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.SparkTestBase

/** Physical-plan quality gates: filters reach the parquet scan, scans
  * prune columns, small sides broadcast, hot paths stay in whole-stage
  * codegen. These are the properties that survive a 100× scale-up. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String = {
    val df = PipelineOps.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("visibility filter is pushed down to the parquet scan") {
    val plan = formatted("q_s5_visibility_filter")
    assert(plan.contains("PushedFilters:"), plan)
    assert("PushedFilters: \\[[^\\]]*(LessThanOrEqual\\(ts|GreaterThan\\(value)".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("scans prune to the referenced columns only") {
    val plan = formatted("q_text_tokens")
    // documents has 5 columns; the query needs doc_id + text
    assert(plan.contains("ReadSchema"), plan)
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("source"), read)
  }

  test("ANN top-k broadcasts the single query vector") {
    val plan = formatted("q_ann_cosine_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("IVF assignment is map-side: no exchange/join/window touches the corpus") {
    // the coarse-quantizer argmax is a literal-array projection, so the
    // whole query must be scan → project → filter → top-k: zero
    // Exchange, zero Join, zero Window anywhere in the corpus plan (the
    // round-3 formulation shuffled the 8×-expanded corpus through a
    // row_number window despite claiming map-side)
    val plan = formatted("q_ann_ivf")
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("seen anti-join is a real join, not a subquery re-scan per row") {
    val plan = formatted("q_f1_seen_antijoin")
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dequeue/host-cap windows partition by their keys (no global sort)") {
    val plan = formatted("q_s3_dequeue_topk")
    assert(plan.contains("Window"), plan)
    // partitioned window ⇒ hashpartitioning exchange, not a single-range sort
    assert(plan.contains("hashpartitioning"), plan)
    val cap = formatted("q_a2_host_cap")
    assert(cap.contains("hashpartitioning"), cap)
  }

  test("scalar pipeline stages run inside whole-stage codegen") {
    for (q <- Seq("q_t3_score_bucket", "q_multimodal_meta")) {
      // execute first: under AQE the final plan (with codegen stage
      // markers) only exists after the run
      val df = PipelineOps.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"$q:\n$plan")
    }
  }

  test("batch ANN broadcasts the query batch and ranks in a per-query window") {
    // one corpus pass serves the whole query batch: the query side must
    // be broadcast (corpus × tiny-batch, never a shuffle join) and the
    // ranking window must hash-partition by q_id (a global-sort window
    // would funnel the scored corpus through one partition)
    val plan = formatted("q_ann_batch_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("Window"), plan)
    assert(plan.contains("hashpartitioning(q_id"), plan)
  }

  test("decontamination joins the eval shingle set broadcast, never a corpus self-join") {
    // the corpus side may shuffle for its per-doc distinct/aggs (keyed
    // by doc_id/hash), but the eval-membership test itself must be a
    // broadcast-hash join — at 100 TB the corpus×eval join being
    // sort-merge would shuffle the whole exploded shingle table a
    // second time for a ~MB-scale probe set
    val plan = formatted("q_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("stratified sample broadcasts the rate table and never shuffles the corpus") {
    val plan = formatted("q_sample_stratified")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    // the only Exchange allowed is the broadcast of the 5-row rate table
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")), plan)
  }

  test("paragraph dedup joins on the unit digest (hash join, no cartesian)") {
    val plan = formatted("q_dedup_paragraph")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("hashpartitioning"), plan)
  }

  test("quality scoring is one scan-project pass (no shuffle); " +
       "higher-order array fns are Spark codegen-fallback by design") {
    val plan = formatted("q_text_quality")
    assert(!plan.contains("Exchange"), plan)
    assert(plan.linesIterator.count(_.startsWith("(")) <= 4, plan) // scan, c2r, project
  }
}
