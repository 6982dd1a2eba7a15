package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.IntLog
import graft.ops.LmOps

class LmSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Driver-side reference of the integer log — the exact definition,
    * independently coded (bit ops, not the column expression).
    */
  private def refLnMicro(x: Long): Long = {
    require(x >= 1)
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val top = if (m >= 8) x >> (m - 8) else x << (8 - m)
    m.toLong * IntLog.Ln2Micro + IntLog.lnTab((top - 256).toInt)
  }

  test("integer log: column expression equals the bit-ops reference and " +
      "stays within 0.004 nats of real ln, monotone") {
    import spark.implicits._
    val probes = (Seq(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 255L, 256L, 257L,
      511L, 512L, 513L, 1000L, 65535L, 65536L, 1000000L,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 1, (1L << 55) - 1, 1L << 55)
      ++ (1 to 200).map(i => math.abs(scala.util.hashing.MurmurHash3
        .stringHash(s"x$i").toLong) % ((1L << 50) - 1) + 1)).distinct
    val got = probes.toDF("x")
      .select(col("x"), IntLog.lnMicroCol(col("x")).as("ln"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { x =>
      assert(got(x) == refLnMicro(x), s"x=$x")
      val err = math.abs(got(x) / 1e6 - math.log(x.toDouble))
      assert(err < 0.004, s"x=$x err=$err")
    }
    // monotone non-decreasing (cost differences of nested counts must
    // never go negative)
    probes.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(refLnMicro(a) <= refLnMicro(b), s"$a,$b")
      case _ =>
    }
  }

  test("trained bigram LM: seen bigrams cheap, backoff pricier, OOV " +
      "priciest; costs replay by hand on a planted corpus") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick fox jumps the quick fox sleeps"),
      (2L, "the quick fox jumps again")).toDF("doc_id", "text")
    val uni = LmOps.trainUnigram(train, "text")
    val bi = LmOps.trainBigram(train, "text")
    val uc = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 13 training tokens; "the quick" occurs 3x, "the"=3, "quick"=3
    assert(uc("the") == 3L && uc("quick") == 3L && uc.values.sum == 13L)
    val score = Seq(
      (10L, "the quick"), // uni(the) + seen bigram
      (11L, "quick sleeps"), // uni(quick) + backoff (pair unseen)
      (12L, "zz yy")) // OOV everywhere
      .toDF("doc_id", "text")
    val got = LmOps.scoreBigram(score, "doc_id", "text", uni, bi)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ln(x: Long) = refLnMicro(x)
    val n = 13L
    assert(got(10L) == (ln(n) - ln(3)) + (ln(3) - ln(3)))
    assert(got(11L) ==
      (ln(n) - ln(3)) + (LmOps.BackoffMicro + ln(n) - ln(1 /*sleeps*/)))
    assert(got(12L) ==
      (ln(n) - ln(1)) + (LmOps.BackoffMicro + ln(n) - ln(1)))
    // the intended ordering: fluent < disfluent < gibberish (per token)
    assert(got(10L) < got(11L) && got(11L) < got(12L))
  }

  test("trained trigram LM: every backoff-chain branch replays by hand; " +
      "broadcast fast path is bit-identical to the default") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick fox jumps the quick fox sleeps"),
      (2L, "the quick fox jumps again")).toDF("doc_id", "text")
    val uni = LmOps.trainUnigram(train, "text")
    val bi = LmOps.trainBigram(train, "text")
    val tri = LmOps.trainTrigram(train, "text")
    val score = Seq(
      (10L, "the quick fox"), // uni + seen bigram + SEEN trigram
      (11L, "quick fox again"), // trigram unseen, (fox again) unseen →
      // double backoff to uni(again)
      (12L, "sleeps the quick"), // trigram (sleeps,the,quick) unseen,
      // bigram (the,quick) seen → single backoff
      (13L, "zz yy xx")) // OOV at every order
      .toDF("doc_id", "text")
    def run(bcast: Boolean) =
      LmOps.scoreTrigram(score, "doc_id", "text", uni, bi, tri, bcast)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = run(bcast = false)
    assert(got == run(bcast = true), "broadcast path diverged")
    def ln(x: Long) = refLnMicro(x)
    val n = 13L
    val bk = LmOps.BackoffMicro
    // c(the quick)=3, c(the quick fox)=3, c(quick fox)=3
    assert(got(10L) == (ln(n) - ln(3)) + (ln(3) - ln(3)) + (ln(3) - ln(3)))
    // p2 of doc 11: (quick, fox, again) unseen; (fox, again) unseen →
    // 2·backoff + uni(again)=1
    assert(got(11L) == (ln(n) - ln(3)) + (ln(3) - ln(3)) +
      (2 * bk + ln(n) - ln(1)))
    // p2 of doc 12: trigram unseen, bigram (the, quick) seen c=3,
    // c(the)=3 → backoff + ln 3 − ln 3; p1 (sleeps, the) unseen →
    // backoff + uni(the)
    assert(got(12L) == (ln(n) - ln(1 /*sleeps*/)) +
      (bk + ln(n) - ln(3)) + (bk + ln(3) - ln(3)))
    // OOV: p0 uni(1); p1 backoff+uni(1); p2 double-backoff+uni(1)
    assert(got(13L) == (ln(n) - ln(1)) + (bk + ln(n) - ln(1)) +
      (2 * bk + ln(n) - ln(1)))
    assert(got(10L) < got(12L) && got(12L) < got(13L))
  }
}
