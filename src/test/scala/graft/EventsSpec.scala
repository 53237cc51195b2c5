package graft

import graft.queries.EventsQueries
import org.scalatest.funsuite.AnyFunSuite

/** Independent driver-side recomputation of the events-telemetry family
  * (windowed ordered funnel, JSON props extraction, retention cohorts)
  * over sf0.001, plus the semantic guarantees the hash oracle can't
  * state: the funnel's order constraint ignores purchases before the
  * signup; both conversion classes occur; the offset-0 retention row
  * equals the cohort size exactly. */
class EventsSpec extends AnyFunSuite with SparkSessionTestWrapper {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val events: Seq[(Long, String, Long)] =
    graft.queries.Tables.events(spark, dir)
      .select($"user_id", $"event_type",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  // ---------------------------------------------------------------- funnel

  test("q_funnel: order + window constraints exact; both classes occur") {
    val byUser = events.groupBy(_._1)
    val expect = byUser.map { case (u, evs) =>
      val signups = evs.filter(_._2 == "signup").map(_._3)
      val t1 = if (signups.isEmpty) -1L else signups.min
      val purch = if (t1 < 0) Nil
        else evs.filter(e => e._2 == "purchase" && e._3 > t1).map(_._3)
      val t2 = if (purch.isEmpty) -1L else purch.min
      val conv = if (t1 >= 0 && t2 >= 0 &&
        t2 - t1 <= EventsQueries.FunnelWindowSec) 1L else 0L
      (u, evs.size.toLong, t1, t2, conv, if (t2 >= 0) t2 - t1 else -1L)
    }.toSet
    val got = EventsQueries.qFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.exists(_._5 == 1L) && got.exists(_._5 == 0L),
      "both conversion classes must occur or the window is inert")
    // order constraint is live: somewhere a user has a purchase BEFORE
    // their first signup that must not have counted
    assert(byUser.exists { case (_, evs) =>
      val s = evs.filter(_._2 == "signup").map(_._3)
      s.nonEmpty && evs.exists(e => e._2 == "purchase" && e._3 < s.min)
    }, "no pre-signup purchase in the corpus — order constraint untested")
  }

  // ------------------------------------------------------------ JSON props

  test("q_json_props matches a driver-side json parse per event type") {
    val props = graft.queries.Tables.events(spark, dir)
      .select($"event_type", $"props").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val K = """"k"\s*:\s*(-?\d+)""".r
    val parsed = props.flatMap { case (t, p) =>
      K.findFirstMatchIn(p).map(m => (t, m.group(1).toLong))
    }
    val expect = parsed.groupBy(_._1).map { case (t, xs) =>
      val ks = xs.map(_._2)
      (t, ks.size.toLong, ks.distinct.size.toLong, ks.sum, ks.min, ks.max)
    }.toSet
    val got = EventsQueries.qJsonProps(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.forall(_._2 > 0L))
  }

  // ------------------------------------------------------------- cohorts

  test("q_retention_cohorts: offset-0 rows equal cohort sizes exactly") {
    val days = events.map { case (u, _, ts) => (u, ts / 86400) }.distinct
    val cohorts = days.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val expect = days.map { case (u, d) => (cohorts(u), d - cohorts(u), u) }
      .groupBy(x => (x._1, x._2))
      .map { case ((c, o), xs) => (c, o, xs.map(_._3).distinct.size.toLong) }
      .toSet
    val got = EventsQueries.qRetentionCohorts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    val cohortSizes = cohorts.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    for ((c, size) <- cohortSizes)
      assert(got.contains((c, 0L, size)),
        s"offset-0 row for cohort $c must equal its size $size")
  }

  // ---------------------------------------------------------- transitions

  test("q_event_transitions: Markov counts exact; rows sum to from-totals") {
    val ids = graft.queries.Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"event_id",
        $"ts".cast("timestamp").cast("long").as("ts_sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = ids.groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._4, e._3)).map(_._2).toSeq
      ordered.sliding(2).collect { case Seq(a, b) => (a, b) }
    }.toSeq
    val counts = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val expect = counts.map { case ((f, t), n) =>
      (f, t, n, totals(f), n * 1000 / totals(f))
    }.toSet
    val got = EventsQueries.qEventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expect)
    // conservation: each from_type's rows sum exactly to its total
    for ((f, rows) <- got.groupBy(_._1))
      assert(rows.toSeq.map(_._3).sum === rows.head._4, s"from $f")
  }

  // --------------------------------------------------------- anomaly days

  test("q_event_anomaly: histogram medians exact; planted replay days spike") {
    val days = events.filter(_._2 == "error").map(_._3 / 86400)
    val plantDays = days.filter(_ % 11 == 3)
    val replayed = days ++ plantDays ++ plantDays
    val daily = replayed.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    def lowerMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted; s(((vs.size + 1) / 2 - 1).toInt)
    }
    val med = lowerMedian(daily.values.toSeq)
    val devs = daily.map { case (d, n) => (d, n, math.abs(n - med)) }
    val mad = lowerMedian(devs.map(_._3).toSeq)
    val expect = devs.map { case (d, n, dev) =>
      (d, n, med, dev, mad, if (dev > 3 * math.max(mad, 1L)) 1L else 0L)
    }.toSet
    val got = EventsQueries.qEventAnomaly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    val spikes = got.filter(_._6 == 1L)
    assert(spikes.nonEmpty, "no spike day — plant inert")
    assert(spikes.forall(_._1 % 11 == 3), "spike outside the planted days")
    assert(got.exists(_._6 == 0L), "every day spikes — baseline broken")
  }
}
