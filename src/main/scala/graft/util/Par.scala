package graft.util

import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.reflect.ClassTag

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Driver-known sequences as distributed Datasets, plus concurrent
  * submission of independent gate phases.
  */
object Par {

  /** `xs` as an n-slice Dataset WITHOUT the round-robin shuffle that
    * `createDataset(xs).repartition(n)` pays: `parallelize` slices the
    * sequence at construction, so the downstream mapPartitions runs as a
    * single shuffle-free stage. Every metadata-plane fan-out (manifest
    * reads, footer scans, file deletes) goes through here.
    */
  def ds[T: Encoder: ClassTag](spark: SparkSession, xs: Seq[T],
      maxSlices: Int): Dataset[T] =
    spark.createDataset(spark.sparkContext.parallelize(xs,
      math.max(1, math.min(xs.size, maxSlices))))

  /** Concurrent submission of INDEPENDENT gate phases (optimization-guide
    * §2.6, "overlap independent jobs"): Spark's scheduler happily runs
    * several jobs at once inside one application — actions are only
    * sequential because the caller invokes them sequentially. Composite
    * gates that build/merge/read several formats back-to-back leave most
    * of the machine idle during each leg's driver-side commit work and
    * task tails; submitting the legs from a small pool lets one leg's
    * tasks back-fill another's gaps.
    *
    * Results return in input order and the first failure rethrows (after
    * every leg settles, so no leg is abandoned mid-write). Parallelism is
    * bounded by `SPARK_GRAFT_GATE_PAR` (default 4 — "2-3 jobs in flight
    * is plenty" per the guide; legs here are 3-5) and never exceeds the
    * item count. `SPARK_GRAFT_GATE_PAR=1` restores strictly serial
    * execution for apples-to-apples measurement.
    */
  private lazy val poolSize: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_GATE_PAR", "4").toInt)

  def map[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    val n = math.min(items.size, poolSize)
    if (n <= 1) return items.map(f)
    // the session is thread-safe for concurrent actions; propagate the
    // caller's active session so library code resolving
    // SparkSession.getActiveSession sees the same one in worker threads
    val active = SparkSession.getActiveSession
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futures = items.map { a =>
        pool.submit(new Callable[B] {
          override def call(): B = {
            active.foreach(SparkSession.setActiveSession)
            f(a)
          }
        })
      }
      // settle every leg before rethrowing the first failure: a leg
      // mid-commit must not be abandoned by a sibling's exception
      val settled = futures.map(fu =>
        try Right(fu.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left(Option(e.getCause).getOrElse(e))
          case e: Throwable => Left(e)
        })
      settled.collectFirst { case Left(e) => e }.foreach(throw _)
      settled.collect { case Right(b) => b }
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES): Unit
    }
  }
}
