package graft.util

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RetryingSlotRpc, SlotRpc}

class RetrySpec extends AnyFunSuite {

  private class Flaky(failures: Int) {
    var calls = 0
    def apply(): String = {
      calls += 1
      if (calls <= failures) throw new IOException(s"transient $calls")
      "ok"
    }
  }

  test("retries transient failures with the linear backoff schedule") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new Flaky(2)
    val out = Retry.withBackoff(maxRetries = 3, delayMs = 100L, sleeper = sleeps += _)(f())
    assert(out == "ok")
    assert(f.calls == 3)
    assert(sleeps.toSeq == Seq(100L, 200L)) // delay * attempt, like the reference
  }

  test("exhausting maxRetries rethrows the last transient error") {
    val f = new Flaky(10)
    val e = intercept[IOException] {
      Retry.withBackoff(maxRetries = 2, delayMs = 1L, sleeper = _ => ())(f())
    }
    assert(e.getMessage == "transient 3") // initial try + 2 retries
    assert(f.calls == 3)
  }

  test("non-transient errors propagate immediately, no sleeps") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withBackoff(maxRetries = 5, delayMs = 1L, sleeper = sleeps += _) {
        calls += 1; throw new IllegalStateException("bug")
      }
    }
    assert(calls == 1 && sleeps.isEmpty)
  }

  test("RetryingSlotRpc heals a transiently-failing rpc") {
    var tipCalls = 0
    val flakyRpc: SlotRpc = new SlotRpc {
      override def tipSlot(): Option[Long] = {
        tipCalls += 1
        if (tipCalls < 3) throw new IOException("connection reset")
        Some(1234L)
      }
      override def availableSlots(a: Long, b: Long): Seq[Long] = Seq.empty
      override def blockJson(slot: Long): Option[String] = None
    }
    val rpc = new RetryingSlotRpc(flakyRpc, maxRetries = 3, delayMs = 1L, sleeper = _ => ())
    assert(rpc.tipSlot().contains(1234L))
    assert(tipCalls == 3)
  }
}
