package graft.analytics

import graft.SparkSpec

/** Property pin for w7's distributed exact ntile (r13 rewrite): the
  * closed-form decile of (global rank, N) — first N%10 tiles take
  * ⌈N/10⌉ rows, the rest ⌊N/10⌋ — assembled from range slices must
  * equal the textbook single-sequence ntile on every fixture shape,
  * not just the one the oracle row pins. Cases sweep the formula's
  * edges: N < 10 (every tile one row, tail tiles empty), N = 10,
  * N % 10 ≠ 0, heavy spend ties straddling tile boundaries (the
  * user_id tie-break decides), and an N large enough that every range
  * slice is non-trivially populated.
  *
  * The reference implementation is pure Scala against the same
  * decimal(38,6) quantization dsum applies (event values are generated
  * at 2dp so the quantization is exact on both sides). */
class W7DecileFormulaSpec extends SparkSpec {

  /** Textbook ntile(10) over (spend desc, user asc): returns
    * decile → (n_users, decile_spend, min_spend, max_spend). */
  private def reference(events: Seq[(Long, Double)])
      : Map[Long, (Long, Double, Double, Double)] = {
    import java.math.{BigDecimal => JBD}
    def q(x: Double): JBD =
      JBD.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val totals = events.groupBy(_._1).map { case (u, vs) =>
      u -> vs.map(v => q(v._2)).foldLeft(JBD.ZERO)(_ add _)
    }.toSeq
    val sorted = totals.map { case (u, s) => (u, s) }
      .sortBy { case (u, s) => (-s.doubleValue, u) }
    val n = sorted.length
    val base = n / 10
    val rem = n % 10
    def decile(r: Int): Long =
      if (r <= rem * (base + 1)) ((r - 1) / (base + 1) + 1).toLong
      else (rem + (r - rem * (base + 1) - 1) / math.max(base, 1) + 1).toLong
    sorted.zipWithIndex
      .groupBy { case (_, i) => decile(i + 1) }
      .map { case (d, rows) =>
        val spends = rows.map(_._1._2)
        d -> (rows.length.toLong,
          spends.foldLeft(JBD.ZERO)(_ add _).doubleValue,
          spends.map(_.doubleValue).min,
          spends.map(_.doubleValue).max)
      }
  }

  test("distributed exact ntile matches the textbook sequence on every " +
    "fixture shape (N<10, N=10, remainders, ties, multi-slice N)") {
    import spark.implicits._
    for (nUsers <- Seq(1, 3, 9, 10, 11, 20, 97, 1000)) {
      val rnd = new scala.util.Random(nUsers * 7919L)
      val events = ((1 to nUsers).flatMap { u =>
        (0 to rnd.nextInt(3)).map { _ =>
          (u.toLong, (rnd.nextInt(40000) - 10000) / 100.0)
        }
      }
        // tie block: five extra users with IDENTICAL totals, so tile
        // boundaries inside the block are decided by user_id alone
        ++ (1 to 5).map(i => ((nUsers + i).toLong, 7.77))).toIndexedSeq
      val dir = graft.TempDirs.scratch(s"w7-prop-$nUsers")
      events.toDF("user_id", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

      val got = WindowQueries.w7Deciles(spark, dir.toString).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val want = reference(events)
      assert(got == want,
        s"n=$nUsers deciles diverged:\n got=${got.toSeq.sortBy(_._1)}\n want=${want.toSeq.sortBy(_._1)}")
    }
  }
}
