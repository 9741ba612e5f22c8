package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench's self-adjudication arithmetic (no Spark session —
  * pure functions over pass totals). */
class BenchSpec extends AnyFunSuite {

  test("hostSettling fires on a monotonic >1.4x decline (the r18 window)") {
    // the r18 driver window: 284 -> 198 -> 149 (1.9x, monotone)
    assert(Bench.hostSettling(Seq(284.0, 198.0, 149.0)))
    // synthetic injected slow first pass
    assert(Bench.hostSettling(Seq(100.0, 80.0, 60.0)))
  }

  test("hostSettling stays quiet on steady or non-monotonic windows") {
    // steady host: small non-monotonic wobble
    assert(!Bench.hostSettling(Seq(100.0, 95.0, 101.0)))
    // monotone but shallow (warm-up inside the normal band)
    assert(!Bench.hostSettling(Seq(100.0, 90.0, 85.0)))
    // a SLOWING host is a different pathology; the flag is specifically
    // "this record's minima are better than the window that took them"
    assert(!Bench.hostSettling(Seq(100.0, 120.0, 140.0)))
    // degenerate inputs
    assert(!Bench.hostSettling(Seq(100.0, 50.0)))
    assert(!Bench.hostSettling(Nil))
  }
}
