package graft.engine

import java.util.concurrent.{Callable, ExecutionException, Executors, ThreadFactory, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicInteger

/** Per-request wall-clock time-box for the pluggable fetch/handler boundary
  * (R7, reference _basic_crawler.py:298,1587-1598: `wait_for(router(ctx),
  * timeout=request_handler_timeout)`).
  *
  * The engine's handler dispatch itself is columnar (a `when`-chain over the
  * label column — it cannot hang), so the only user code on the per-request
  * path is the pluggable `statusAtFn` fetch/handler boundary; that is what
  * the timeout races. The racing pool is a per-JVM daemon cached pool
  * (object singleton — executors resolve it locally, nothing is serialized),
  * and the machinery engages ONLY when `CrawlConfig.requestHandlerTimeoutMs`
  * is set: the default path calls the function directly with zero overhead.
  *
  * On timeout the in-flight call is interrupted (`cancel(true)`), exactly
  * the reference's cancellation semantics: asyncio can only cancel a
  * coroutine at an await point, and the JVM can only interrupt code that
  * checks interruption — a busy-looping handler leaks a pool thread in both
  * worlds. Non-timeout exceptions from the boxed call propagate unchanged.
  */
object TimeBoxed {

  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    private val n = new AtomicInteger(0)
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-timebox-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  })

  /** `Some(f)` if it returns within `timeoutMs`, `None` on timeout (the
    * in-flight call is interrupted). Exceptions thrown by `f` propagate.
    */
  def run[T](timeoutMs: Long)(f: => T): Option[T] = {
    val fut = pool.submit(new Callable[T] { def call(): T = f })
    try Some(fut.get(timeoutMs, TimeUnit.MILLISECONDS))
    catch {
      case _: TimeoutException =>
        fut.cancel(true)
        None
      case e: ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }
}
