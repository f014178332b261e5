package graft

import scala.util.{Failure, Success, Try}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ingest

class IngestSpec extends AnyFunSuite {

  test("withRetry: succeeds after transient failures, exhausts after limit") {
    var calls = 0
    val r = Ingest.withRetry(5)(() => {
      calls += 1
      if (calls < 3) Failure(new RuntimeException("transient")) else Success(42)
    })
    assert(r == Success(42) && calls == 3)

    var calls2 = 0
    val r2 = Ingest.withRetry(2)(() => { calls2 += 1; Failure(new RuntimeException("hard")): Try[Int] })
    assert(r2.isFailure && calls2 == 3) // initial try + 2 retries
  }

  test("throttle: spaces permits by the interval") {
    var now = 0L
    val t = new Ingest.Throttle(2000, () => now)
    assert(t.acquireDelay() == 0L)     // first permit free
    assert(t.acquireDelay() == 2000L)  // second must wait a full interval
    now = 5000L                        // long idle → bucket drained
    assert(t.acquireDelay() == 0L)
  }

  test("fetchAllPages: terminates on short page, errors stay in-band") {
    val pages = Map(
      0 -> Seq.fill(3)("r"), 1 -> Seq.fill(3)("r"), 2 -> Seq("r")) // short
    val got = Ingest.fetchAllPages(perPage = 3, retries = 0)(p => Success(pages(p)))
    assert(got.map(_._1) == Seq(0, 1, 2))
    assert(got.forall(_._2.isRight))

    var attempts = 0
    val flaky = Ingest.fetchAllPages(perPage = 3, retries = 3) {
      case 0 => Success(Seq.fill(3)("r"))
      case 1 => attempts += 1
        if (attempts < 3) Failure(new RuntimeException("503")) else Success(Seq("r"))
      case _ => fail("should have stopped")
    }
    assert(flaky == Seq((0, Right(Seq.fill(3)("r"))), (1, Right(Seq("r")))))

    val hard = Ingest.fetchAllPages(perPage = 3, retries = 1) {
      case 0 => Success(Seq.fill(3)("r"))
      case _ => Failure(new RuntimeException("down"))
    }
    assert(hard.map(_._1) == Seq(0, 1))
    assert(hard(1)._2 == Left("down"))
  }
}
