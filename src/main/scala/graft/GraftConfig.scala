package graft

import org.apache.spark.sql.SparkSession

/** Reference configuration surface mapped onto Spark.
  *
  * pyhdk's `init(**kwargs)` routes keyword args through a CLI-style
  * config builder (reference: python/pyhdk/_common.pyx:187 buildConfig,
  * omniscidb/ConfigBuilder/ConfigBuilder.cpp option table). A porting
  * user calls e.g. `init(enable_watchdog=False, null_div_by_zero=True)`;
  * this object accepts the same knob vocabulary (dash or underscore
  * form) and translates each knob into what it honestly means on Spark:
  *
  *  - [[GraftConfig.Applied]] — set a concrete Spark SQL conf now
  *    (all targets are runtime-settable session confs);
  *  - [[GraftConfig.Structural]] — the behavior the knob asks for is
  *    how Spark already works (can't be turned off, nothing to set);
  *  - [[GraftConfig.Ignored]] — GPU/launch-time/engine-internal knobs
  *    with no runtime analogue; the note says where that concern lives
  *    in a Spark deployment.
  *
  * Unknown knobs throw, mirroring the reference's CLI parse error.
  */
object GraftConfig {

  sealed trait Mapping { def knob: String; def note: String }
  /** Knob translated to a live Spark conf (set on the session). */
  final case class Applied(knob: String, sparkConf: String, value: String)
      extends Mapping { def note = s"$sparkConf=$value" }
  /** Knob satisfied by construction on Spark. */
  final case class Structural(knob: String, note: String) extends Mapping
  /** Knob with no runtime analogue; note says where the concern lives. */
  final case class Ignored(knob: String, note: String) extends Mapping

  /** approx_count_distinct relative standard deviation for an HLL
    * precision in bits — Spark parameterizes HLL by rsd, HDK by
    * register-index bits; rsd ≈ 1.04/√(2^bits). */
  def hllRsd(bits: Int): Double = 1.04 / math.sqrt((1L << bits).toDouble)

  def apply(spark: SparkSession, knobs: (String, Any)*): Seq[Mapping] =
    knobs.map { case (rawName, rawValue) =>
      val knob = rawName.trim.toLowerCase.replace('-', '_')
      val v = rawValue.toString
      def bool = rawValue match {
        case b: Boolean => b
        case s => s.toString.toBoolean
      }
      def set(conf: String, value: String): Mapping = {
        spark.conf.set(conf, value)
        Applied(knob, conf, value)
      }
      knob match {
        // ---- semantics-bearing: these change query results/plans ----
        case "null_div_by_zero" =>
          // HDK: x/0 → NULL instead of error; Spark: non-ANSI division
          // already yields NULL, ANSI mode raises — so the knob IS the
          // ANSI toggle, inverted.
          set("spark.sql.ansi.enabled", (!bool).toString)
        case "enable_loop_join" =>
          set("spark.sql.crossJoin.enabled", bool.toString)
        case "enable_filter_push_down" =>
          set("spark.sql.parquet.filterPushdown", bool.toString)
        case "enable_columnar_output" =>
          set("spark.sql.parquet.enableVectorizedReader", bool.toString)
        case "enable_lazy_fetch" =>
          // lazy fetch = don't materialize columns until used; the
          // Catalyst analogue users can toggle is nested-schema pruning
          // (top-level pruning is unconditional)
          set("spark.sql.optimizer.nestedSchemaPruning.enabled", bool.toString)
        case "from_table_reordering" =>
          set("spark.sql.cbo.joinReorder.enabled", bool.toString)
        case "huge_join_hash_threshold" =>
          // "too big to hash-broadcast" — Spark's size-based broadcast
          // cutoff is the same decision (bytes)
          set("spark.sql.autoBroadcastJoinThreshold", v)
        case "streaming_top_n_max" =>
          set("spark.sql.execution.topKSortFallbackThreshold", v)
        case "constrained_by_in_threshold" =>
          set("spark.sql.optimizer.inSetConversionThreshold", v)
        case "groupby_max_partitions" =>
          set("spark.sql.shuffle.partitions", v)
        case "enable_data_recycler" | "use_hashtable_cache" =>
          // recycled intermediate results ≈ reused exchanges (one
          // shuffle feeding identical consumers is computed once)
          set("spark.sql.exchange.reuse", bool.toString)
        case "hll_precision_bits" =>
          // no engine conf: recorded for approx_count_distinct callers
          // (rsd = hllRsd(bits))
          set("graft.hll.precisionBits", v)

        // ---- satisfied by construction on Spark ----
        case "cpu_only" =>
          Structural(knob, "Spark executes on CPU; no device selection")
        case "bigint_count" =>
          Structural(knob, "count() is always BIGINT in Spark SQL")
        case "enable_window_functions" =>
          Structural(knob, "window functions are core SQL; not optional")
        case "allow_cpu_retry" | "allow_query_step_cpu_retry" =>
          Structural(knob, "task retries are spark.task.maxFailures")
        case "enable_runtime_query_interrupt" |
            "enable_non_kernel_time_query_interrupt" |
            "running_query_interrupt_freq" =>
          Structural(knob, "jobs are cancelable via cancelJobGroup")
        case "enable_hoist_literals" | "optimize_row_init" |
            "enable_direct_columnarization" | "enable_automatic_ir_metadata" =>
          Structural(knob, "Tungsten whole-stage codegen owns this")
        case "enable_cpu_sub_tasks" | "cpu_sub_task_size" =>
          Structural(knob,
            "intra-fragment parallelism = partition count (importer fragmentSize)")
        case "enable_cpu_groupby_multifrag_kernels" |
            "enable_cpu_partitioned_groupby" | "groupby_min_partitions" =>
          Structural(knob,
            "partial aggregation + AQE coalesce govern group-by fan-in")

        // ---- no runtime analogue ----
        case "enable_watchdog" | "enable_dynamic_watchdog" |
            "dynamic_watchdog_time_limit" | "watchdog_baseline_max_groups" |
            "watchdog_in_clause_max_size" | "trivial_loop_join_threshold" =>
          Ignored(knob, "query policing lives in the cluster manager / " +
            "spark.task.* policies, not a per-query watchdog")
        case "cpu_buffer_mem_bytes" | "pmem_size" | "enable_tiered_cpu_mem" |
            "min_cpu_slab_size" | "max_cpu_slab_size" =>
          Ignored(knob, "executor memory is launch-time (spark.executor.memory)")
        case g if g.startsWith("gpu_") || g.startsWith("enable_gpu_") ||
            g == "initialize_with_gpu_vendor" || g == "enable_heterogeneous" ||
            g == "enable_multifrag_heterogeneous" || g == "enable_multifrag_rs" =>
          Ignored(knob, "no GPU backend; Spark runs CPU-only")
        case "code_cache_size" | "dag_cache_size" | "use_rel_alg_cache" |
            "build_rel_alg_cache" | "use_estimator_result_cache" |
            "hashtable_cache_total_bytes" | "max_cacheable_hashtable_size_bytes" =>
          Ignored(knob, "plan/codegen caches are Spark-internal and unbounded-safe")
        case "enable_debug_timer" | "dump_after_all" | "large_ndv_threshold" |
            "skip_intermediate_count" | "enable_union" | "enable_thrift_logs" =>
          Ignored(knob, "diagnostic/legacy knob with no Spark analogue")

        case other =>
          throw new IllegalArgumentException(
            s"unknown config knob: '$other' (reference ConfigBuilder.cpp vocabulary)")
      }
    }
}
