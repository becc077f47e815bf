package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join correctness against an obvious-by-inspection brute force:
  * per left row, the max-time right row with time <= left time (ties on
  * time resolved to the max payload), NULL when none precedes. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join equals the brute-force definition on random data") {
    val rnd = new scala.util.Random(37)
    val lefts = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(100).toLong))
    val rights = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble))

    val got = AsOfJoin.asOf(
      lefts.toDF("k", "id", "t"), rights.toDF("k", "t", "v"),
      key = "k", time = "t", payload = Seq("v"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    lefts.foreach { case (k, id, t) =>
      val eligible = rights.filter(r => r._1 == k && r._2 <= t)
      val expected =
        if (eligible.isEmpty) None
        else {
          val tmax = eligible.map(_._2).max
          Some(eligible.filter(_._2 == tmax).map(_._3).max)
        }
      assert(got(id) == expected, s"left id=$id k=$k t=$t")
    }
  }

  test("a right row at exactly the left time matches (<= semantics)") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "id", "t")
    val r = Seq((1L, 100L, 7.0)).toDF("k", "t", "v")
    val row = AsOfJoin.asOf(l, r, "k", "t", Seq("v")).head()
    assert(row.getDouble(3) == 7.0)
  }

  test("forward as-of equals the brute-force definition on random data") {
    val rnd = new scala.util.Random(53)
    val lefts = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(100).toLong))
    val rights = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble))

    val got = AsOfJoin.asOfForward(
      lefts.toDF("k", "id", "t"), rights.toDF("k", "t", "v"),
      key = "k", time = "t", payload = Seq("v"))
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    lefts.foreach { case (k, id, t) =>
      val eligible = rights.filter(r => r._1 == k && r._2 >= t)
      val expected =
        if (eligible.isEmpty) None
        else {
          val tmin = eligible.map(_._2).min
          Some(eligible.filter(_._2 == tmin).map(_._3).max)
        }
      assert(got(id) == expected, s"left id=$id k=$k t=$t")
    }
  }

  test("forward: a right row at exactly the left time matches (>= semantics)") {
    val l = Seq((1L, 10L, 100L)).toDF("k", "id", "t")
    val r = Seq((1L, 100L, 7.0), (1L, 120L, 9.0)).toDF("k", "t", "v")
    val row = AsOfJoin.asOfForward(l, r, "k", "t", Seq("v")).head()
    assert(row.getDouble(3) == 7.0)
  }

  test("nearest equals the brute-force min-|gap| definition, ties backward") {
    val rnd = new scala.util.Random(71)
    val lefts = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(100).toLong))
    val rights = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, rnd.nextInt(1000).toDouble))

    // columns: k, id, t, direction, gap_t, nearest_v
    val got = AsOfJoin.nearest(
      lefts.toDF("k", "id", "t"), rights.toDF("k", "t", "v"),
      key = "k", time = "t", payload = Seq("v"))
      .collect().map(r => (r.getLong(1), (
        if (r.isNullAt(3)) None else Some(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap

    lefts.foreach { case (k, id, t) =>
      val back = rights.filter(r => r._1 == k && r._2 <= t)
      val fwd = rights.filter(r => r._1 == k && r._2 >= t)
      val expected =
        if (back.isEmpty && fwd.isEmpty) (None, None, None)
        else {
          val bGap = back.map(r => t - r._2).minOption
          val fGap = fwd.map(r => r._2 - t).minOption
          val pickB = bGap.isDefined && (fGap.isEmpty || bGap.get <= fGap.get)
          if (pickB)
            (Some("backward"), bGap,
              Some(back.filter(_._2 == t - bGap.get).map(_._3).max))
          else
            (Some("forward"), fGap,
              Some(fwd.filter(_._2 == t + fGap.get).map(_._3).max))
        }
      assert(got(id) == expected, s"left id=$id k=$k t=$t")
    }
  }
}
