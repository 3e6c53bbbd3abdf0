package graft.util

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent driver-side evaluation of INDEPENDENT Spark actions (guide
  * §2.6: actions are only sequential because driver code calls them
  * sequentially; submitting independent jobs together lets one job's task
  * tail back-fill the executors the other frees). Used for the paired
  * localCheckpoint barriers operators take on independent inputs.
  * Exceptions propagate to the caller. */
object Par {

  def run(fs: (() => Unit)*): Unit = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(fs.map(f => Future(f()))), Duration.Inf)
  }

  /** Evaluate two independent expressions concurrently. */
  def eval2[A, B](a: => A, b: => B): (A, B) = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(a)
    val fb = Future(b)
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }
}
