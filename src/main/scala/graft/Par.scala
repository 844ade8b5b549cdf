package graft

import org.apache.spark.sql.DataFrame

/** Overlap INDEPENDENT construction-time Spark jobs (guide §2.6).
  *
  * Several gate queries and operators build two or more frames that
  * are independent until a final combining join/union — and each
  * leg's construction runs eager actions (persist materialization,
  * `localCheckpoint`). Built sequentially, the cluster idles in every
  * job's scheduling tail; Spark's scheduler happily runs concurrent
  * jobs, actions are only sequential because driver code calls them
  * sequentially. `frames` constructs the legs from a bounded thread
  * pool and returns them in CALLER ORDER, so downstream composition
  * (union order, join sides) — and therefore every declared query's
  * result — is unchanged: each leg is deterministic on its own, and
  * concurrent first-materialization of a shared persisted input is
  * safe (block-level locking; one task computes, others wait).
  *
  * Thread count = legs (callers pass 2-4); no pool is retained. */
object Par {
  def frames(thunks: (() => DataFrame)*): Seq[DataFrame] = {
    if (thunks.size <= 1) return thunks.map(_())
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.sequence(thunks.map(t => Future(t())).toSeq),
      Duration.Inf)
    finally pool.shutdown()
  }
}
