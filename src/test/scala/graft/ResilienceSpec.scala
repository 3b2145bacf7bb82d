package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Resilience

class ResilienceSpec extends AnyFunSuite {

  test("retryWithBackoff retries transient failures with exponential delays") {
    var calls = 0
    val delays = Seq.newBuilder[Long]
    val got = Resilience.retryWithBackoff(maxAttempts = 5, baseDelayMs = 10,
      sleep = delays += _) { () =>
      calls += 1
      if (calls < 4) throw new RuntimeException("429 Throttled")
      "ok"
    }
    assert(got == "ok" && calls == 4)
    assert(delays.result() == Seq(10L, 20L, 40L))
  }

  test("retryWithBackoff propagates non-transient errors immediately") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Resilience.retryWithBackoff(maxAttempts = 5, sleep = _ => ()) { () =>
        calls += 1
        throw new RuntimeException("permission denied")
      }
    }
    assert(e.getMessage == "permission denied" && calls == 1)
  }

  test("retryWithBackoff gives up after maxAttempts on persistent transient errors") {
    var calls = 0
    intercept[RuntimeException] {
      Resilience.retryWithBackoff(maxAttempts = 3, sleep = _ => ()) { () =>
        calls += 1
        throw new RuntimeException("503 unavailable")
      }
    }
    assert(calls == 3)
  }

  test("fetchRegions skips access-denied regions and keeps the rest") {
    val got = Resilience.fetchRegions(Seq("r1", "r2", "r3")) {
      case "r2" => throw new RuntimeException("AccessDenied for region")
      case r => Seq(s"$r-asset")
    }
    assert(got == Seq("r1" -> Seq("r1-asset"), "r3" -> Seq("r3-asset")))
  }

  test("fetchRegions fails hard on non-skippable errors") {
    intercept[RuntimeException] {
      Resilience.fetchRegions(Seq("r1")) { _ => throw new RuntimeException("boom") }
    }
  }

  test("paginate follows tokens and honors the page cap") {
    val (all, truncated) = Resilience.paginate(maxPages = 100) { token =>
      val page = token.map(_.toInt).getOrElse(0)
      (Seq(page), if (page < 4) Some((page + 1).toString) else None)
    }
    assert(all == Seq(0, 1, 2, 3, 4) && !truncated)

    val (capped, wasTruncated) = Resilience.paginate(maxPages = 3) { token =>
      val page = token.map(_.toInt).getOrElse(0)
      (Seq(page), Some((page + 1).toString)) // endless feed
    }
    assert(capped == Seq(0, 1, 2) && wasTruncated)
  }
}
