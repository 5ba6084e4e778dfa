package graft

/** Partitioning-invariance: a distributed engine's results must be a
  * pure function of the DATA, never of the physical layout — shuffle
  * fan-out, input split sizes, or task scheduling order. This is the
  * local-mode proxy for "same answer on a 1000-executor cluster": the
  * queries most at risk are the ones built on hashes, windows,
  * iterative convergence, and greedy packing, so each runs under a
  * deliberately hostile sibling session (prime shuffle fan-out, input
  * files split into ~64 KB chunks) and must reproduce the default
  * session's rows exactly.
  *
  * `newSession()` shares the SparkContext but takes its own SQL conf,
  * so both layouts run in the one test JVM.
  */
class DeterminismSpec extends SparkSpec {

  private val sensitive = Seq(
    "q_shard_assign",    // md5 permutation + per-shard window row_number
    "q_dedup_cluster",   // iterative label propagation to fixpoint
    "q_pack_sequences",  // greedy cumsum bin packing
    "q_dedup_minhash",   // capped-bucket pair expansion over collect_list
    "q_dedup_simhash",   // same kernel, hash payload carried in-row
    "q_topk_per_group",  // rank-window ties
    "q_agg_argmax",      // max_by reduction order (composite key makes it invariant)
    "q_agg_weighted_median", // cumulative-weight window crossing
    "q_dup_passages",    // capped-bucket expansion + islands windows
    "q_sample",          // consistent-hash membership
    "q_seq_count",       // collect_list order neutralized by array_sort
    "q_gap_fill",        // span explode + left join
    "q_agg_entropy",     // multi-term float sum under rounding
    "q_agg_uniq_upto",   // capped distinct set: saturation is merge-order-free
    "q_agg_hll_merge",   // HLL union commutes exactly
    "q_topk_weighted",   // exact while capacity covers the domain
    "q_agg_delta_sum",   // lag window under second-truncated ts ties
    "q_interval_merge",  // islands: running-max frame under (st,en) ties
    "q_win_cum_share",   // running revenue share: cumsum of doubles
    "q_win_lttb",        // fp-area argmax per bucket, tie-broken on x
    "q_agg_mann_whitney", // value-grid cumulative ranks
    "q_agg_ks_test",     // value-grid CDF sup-distance
    "q_zipf_fit",        // top-100 rank ties broken by token
    "q_ttl_rollup")      // per-(key,day) double sums under rounding

  test("layout-hostile session reproduces every hash/window/iterative query") {
    val hostile = spark.newSession()
    hostile.conf.set("spark.sql.shuffle.partitions", "7")
    hostile.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    hostile.conf.set("spark.sql.files.openCostInBytes", "0")
    for (q <- sensitive) {
      val expect = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      val got = SparkEntry.queries(q)(hostile, sf).collect().map(_.toString).toSeq
      assert(got == expect, s"$q changed under a different physical layout")
    }
  }
}
