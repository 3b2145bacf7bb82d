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

  // util.py:46-66 — code must be AccessDenied[Exception] AND the message
  // must carry both phrases, case-insensitively.
  test("isServiceControlPolicyExplicitDeny matches the reference's code/message contract") {
    import Resilience.{ClientError, isServiceControlPolicyExplicitDeny}
    assert(isServiceControlPolicyExplicitDeny(ClientError("AccessDenied",
      "User is not authorized with an explicit deny in a service control policy")))
    assert(isServiceControlPolicyExplicitDeny(ClientError("AccessDeniedException",
      "EXPLICIT DENY in a SERVICE CONTROL POLICY blocked the call")))
    // wrong code: even the right message does not classify
    assert(!isServiceControlPolicyExplicitDeny(ClientError("UnauthorizedOperation",
      "explicit deny in a service control policy")))
    // right code, message missing one of the two phrases
    assert(!isServiceControlPolicyExplicitDeny(ClientError("AccessDenied",
      "explicit deny by resource policy")))
    assert(!isServiceControlPolicyExplicitDeny(ClientError("AccessDenied",
      "service control policy does not allow this")))
    // empty message is never an SCP deny
    assert(!isServiceControlPolicyExplicitDeny(ClientError("AccessDenied", "")))
    assert(!isServiceControlPolicyExplicitDeny(new RuntimeException(
      "explicit deny in a service control policy")))
  }

  // util.py:615-649 — the shared skip classification the SCP check refines.
  test("isRegionSkippableClientError covers denied codes and unsupported-region operations") {
    import Resilience.{ClientError, isRegionSkippableClientError}
    for (code <- Resilience.RegionAccessDeniedCodes)
      assert(isRegionSkippableClientError(ClientError(code, "no")))
    assert(isRegionSkippableClientError(ClientError("UnknownOperationException",
      "This operation is Not Supported in the called region")))
    assert(isRegionSkippableClientError(ClientError("UnknownOperationException",
      "api unsupported in this region")))
    // UnknownOperationException without the regional snippet is NOT skippable
    assert(!isRegionSkippableClientError(ClientError("UnknownOperationException",
      "malformed request")))
    assert(!isRegionSkippableClientError(ClientError("UnknownOperationException", "")))
    assert(!isRegionSkippableClientError(ClientError("ValidationException", "nope")))
    assert(!isRegionSkippableClientError(new RuntimeException("AccessDenied")))
    // every SCP explicit deny is also region-skippable (it is a sub-class
    // of the skip, logged differently — util.py:731-742)
    val scp = ClientError("AccessDenied",
      "explicit deny in a service control policy")
    assert(isRegionSkippableClientError(scp) &&
      Resilience.isServiceControlPolicyExplicitDeny(scp))
  }

  test("fetchRegions skips SCP-denied and unsupported regions via the classified default") {
    import Resilience.ClientError
    val got = Resilience.fetchRegions(Seq("r1", "r2", "r3", "r4")) {
      case "r2" => throw ClientError("AccessDeniedException",
        "explicit deny in a service control policy")
      case "r3" => throw ClientError("UnknownOperationException",
        "not supported in this region")
      case r => Seq(s"$r-asset")
    }
    assert(got == Seq("r1" -> Seq("r1-asset"), "r4" -> Seq("r4-asset")))
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
