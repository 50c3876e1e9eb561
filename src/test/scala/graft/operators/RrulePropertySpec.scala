package graft.operators

import java.time.{DayOfWeek, LocalDate, LocalDateTime, ZoneOffset}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for the RRULE expander (G1): random simple
  * rules are checked against an independent day-by-day scanner that decides
  * membership per date (period index + BY-filters), structurally unlike the
  * expander's per-period candidate model. Covers DAILY/WEEKLY/MONTHLY with
  * INTERVAL, BYDAY (incl. monthly ordinals), BYMONTHDAY and COUNT. */
class RrulePropertySpec extends AnyFunSuite {

  private val zone = ZoneOffset.UTC
  private val start = LocalDateTime.of(2024, 1, 15, 10, 30) // a Monday
  private val cutoff = start.plusYears(2)

  /** Brute force: scan every day in [start, cutoff), test membership. */
  private def scan(rule: Rrule.Rule): Seq[LocalDateTime] = {
    val startDate = start.toLocalDate
    def mondayOfWeek(d: LocalDate): LocalDate =
      d.minusDays((d.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue + 7) % 7)
    def nthOfMonth(d: LocalDate): Int = (d.getDayOfMonth - 1) / 7 + 1
    def nthFromEnd(d: LocalDate): Int = (d.lengthOfMonth() - d.getDayOfMonth) / 7 + 1
    def byDayMatches(d: LocalDate): Boolean = rule.byDay.exists { case (ord, dow) =>
      dow == d.getDayOfWeek &&
        (ord == 0 || (ord > 0 && nthOfMonth(d) == ord) || (ord < 0 && nthFromEnd(d) == -ord))
    }
    val all = Iterator.iterate(startDate)(_.plusDays(1))
      .takeWhile(d => d.atTime(start.toLocalTime).isBefore(cutoff))
      .filter { d =>
        rule.freq match {
          case "DAILY" =>
            val periodOk = java.time.temporal.ChronoUnit.DAYS.between(startDate, d) % rule.interval == 0
            val dayOk = rule.byDay.isEmpty || rule.byDay.exists(_._2 == d.getDayOfWeek)
            periodOk && dayOk
          case "WEEKLY" =>
            val weeks = java.time.temporal.ChronoUnit.DAYS
              .between(mondayOfWeek(startDate), mondayOfWeek(d)) / 7
            val periodOk = weeks % rule.interval == 0
            val dayOk =
              if (rule.byDay.isEmpty) d.getDayOfWeek == startDate.getDayOfWeek
              else rule.byDay.exists(_._2 == d.getDayOfWeek)
            periodOk && dayOk
          case "MONTHLY" =>
            val months = java.time.temporal.ChronoUnit.MONTHS.between(
              startDate.withDayOfMonth(1), d.withDayOfMonth(1))
            val periodOk = months % rule.interval == 0
            val dayOk =
              if (rule.byMonthDay.nonEmpty)
                rule.byMonthDay.exists(md =>
                  (md > 0 && d.getDayOfMonth == md) ||
                    (md < 0 && d.getDayOfMonth == d.lengthOfMonth() + 1 + md))
              else if (rule.byDay.nonEmpty) byDayMatches(d)
              else d.getDayOfMonth == startDate.getDayOfMonth
            periodOk && dayOk
          case other => fail(s"unexpected freq $other")
        }
      }
      .map(_.atTime(start.toLocalTime))
      .toSeq
    rule.count.fold(all)(all.take)
  }

  private val dowGen = Gen.oneOf(DayOfWeek.values.toSeq)
  private val ruleGen: Gen[Rrule.Rule] = for {
    freq <- Gen.oneOf("DAILY", "WEEKLY", "MONTHLY")
    interval <- Gen.chooseNum(1, 3)
    count <- Gen.option(Gen.chooseNum(1, 25))
    byDay <- freq match {
      case "MONTHLY" => Gen.oneOf(
        Gen.const(List.empty[(Int, DayOfWeek)]),
        Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-2, 3), dowGen)).map(_.distinct.take(3)))
      case _ => Gen.oneOf(
        Gen.const(List.empty[(Int, DayOfWeek)]),
        Gen.nonEmptyListOf(Gen.zip(Gen.const(0), dowGen)).map(_.distinct.take(3)))
    }
    byMonthDay <- if (freq == "MONTHLY" && byDay.isEmpty)
      Gen.oneOf(Gen.const(List.empty[Int]),
        Gen.nonEmptyListOf(Gen.oneOf(Gen.chooseNum(1, 28), Gen.const(-1))).map(_.distinct.take(3)))
    else Gen.const(List.empty[Int])
  } yield Rrule.Rule(freq = freq, interval = interval, count = count,
    byDay = byDay, byMonthDay = byMonthDay)

  test("expander matches an independent day-scanner on 300 random rules") {
    val seed = org.scalacheck.rng.Seed(23L)
    val rules = Gen.listOfN(300, ruleGen).apply(Gen.Parameters.default, seed).get
    rules.foreach { rule =>
      val got = Rrule.occurrences(start, rule, zone, cutoff = cutoff)
        .filter(_.isBefore(cutoff))
      val want = scan(rule)
      assert(got == want,
        s"\nrule=$rule\n got=${got.take(8)} (${got.size})\nwant=${want.take(8)} (${want.size})")
    }
  }
}
