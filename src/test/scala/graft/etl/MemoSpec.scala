package graft.etl

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Memo's contract: the builder runs exactly once per key even under a
  * thundering herd — the property the staged-lake/dashboard/incremental
  * memoizations rely on (a double build means doubled IO and a leaked
  * scratch directory). */
class MemoSpec extends AnyFunSuite {

  test("builder runs exactly once per key under concurrent first access") {
    val memo = new Memo[Int, String]
    val builds = new AtomicInteger(0)
    val threads = 16
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    try {
      val futures = (0 until threads).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            start.await()
            memo(i % 2) { // two keys, eight racers each
              builds.incrementAndGet()
              s"v${i % 2}"
            }
          }
        })
      }
      start.countDown()
      val results = futures.map(_.get(30, TimeUnit.SECONDS))
      assert(builds.get() == 2, s"expected exactly 2 builds, got ${builds.get()}")
      assert(results.zipWithIndex.forall { case (r, i) => r == s"v${i % 2}" })
    } finally pool.shutdownNow()
  }

  test("subsequent accesses return the cached value without rebuilding") {
    val memo = new Memo[String, Int]
    var builds = 0
    val a = memo("k") { builds += 1; 42 }
    val b = memo("k") { builds += 1; 43 }
    assert(a == 42 && b == 42 && builds == 1)
  }
}
