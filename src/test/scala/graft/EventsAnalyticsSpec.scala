package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft

/** Ordering semantics of the q74 funnel and q75 retention OPERATORS
  * (Graft.funnelStages / retentionTriangle / epochDay — the same code
  * the registered queries call, so a semantics change here fails both). */
class EventsAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("funnel stages only count events strictly after the previous anchor") {
    val s = spark; import s.implicits._
    // user 1: view(10) -> click(20) -> purchase(30): full funnel
    // user 2: click(5) BEFORE view(10), purchase(20) after: the early
    //         click must not count; no later click => funnel stops at view
    // user 3: purchase(5) only: no view => counts nowhere
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 20L),
      (3L, "purchase", 5L)).toDF("user_id", "event_type", "us")
    val Seq(v, c, p) = Graft.funnelStages(e, "user_id", "event_type", "us",
      Seq("view", "click", "purchase"))
    assert(v.count() === 2) // users 1 and 2 viewed
    assert(c.collect().map(_.getLong(0)).toSeq === Seq(1L)) // user 2's click was too early
    assert(p.collect().map(_.getLong(0)).toSeq === Seq(1L))
    // anchors are the FIRST qualifying event, not any later one
    assert(c.head.getLong(1) === 20L && p.head.getLong(1) === 30L)
  }

  test("retention offsets are relative to each user's own first day") {
    val s = spark; import s.implicits._
    val e = Seq((1L, 100L), (1L, 102L), (2L, 101L), (2L, 102L))
      .toDF("user_id", "day")
    val out = Graft.retentionTriangle(e, "user_id", "day")
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq((100L, 0L, 1L), (100L, 2L, 1L), (101L, 0L, 1L), (101L, 1L, 1L)))
  }

  test("epochDay floors (matches DuckDB //) including pre-1970 timestamps") {
    val s = spark; import s.implicits._
    val df = Seq(
      "1970-01-01 00:00:00", // us = 0       -> day 0
      "1970-01-02 00:00:00", // us = 1 day   -> day 1 (exact multiple)
      "1969-12-31 23:59:59", // us < 0       -> day -1 (div would give 0)
      "1969-12-30 12:00:00"  // -1.5 days    -> day -2
    ).toDF("s").select(to_timestamp($"s").as("ts"))
    val days = df.select(Graft.epochDay($"ts")).collect().map(_.getLong(0))
    assert(days.toSeq === Seq(0L, 1L, -1L, -2L))
  }
}
