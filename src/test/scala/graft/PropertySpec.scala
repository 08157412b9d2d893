package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY.md §5.3) over generated in-memory frames:
  * explode conservation, unwind→re-nest identity, cents-sum
  * associativity under repartitioning, weekday parity. */
object PropertySpec extends Properties("graft") {
  import TestSpark._
  import spark.implicits._

  private val basketGen: Gen[List[(Long, List[Int])]] =
    Gen.listOfN(20, for {
      id <- Gen.chooseNum(1L, 1000L)
      items <- Gen.listOf(Gen.chooseNum(1, 50))
    } yield (id, items)).map(_.distinctBy(_._1)).suchThat(_.nonEmpty)

  property("explode preserves the element multiset sum") =
    forAll(basketGen) { rows =>
      val df = rows.toDF("id", "items")
      val direct = rows.map(_._2.map(_.toLong).sum).sum
      val exploded = df.select(explode($"items").as("x"))
        .agg(coalesce(sum($"x"), lit(0L))).head.getLong(0)
      exploded == direct
    }

  property("unwind → re-nest is identity on (id, item-multiset)") =
    forAll(basketGen) { rows =>
      val df = rows.toDF("id", "items")
      val roundTrip = df.select($"id", explode($"items").as("x"))
        .groupBy($"id").agg(sort_array(collect_list($"x")).as("items"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      val expected = rows.filter(_._2.nonEmpty)
        .map { case (id, xs) => id -> xs.sorted }.toMap
      roundTrip == expected
    }

  property("cents-sum is invariant under repartitioning") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0.01, 99999.99))) { xs =>
      val df = xs.toDF("x")
      def total(parts: Int): Double = df.repartition(parts)
        .agg(sum(Tables.cents($"x")) / lit(100.0)).head.getDouble(0)
      total(1) == total(7)
    }

  property("weekday matches pandas convention (Mon=0) for arbitrary dates") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 20000))) { ds =>
      val df = ds.toDF("d")
        .select(date_add(lit("1970-01-01").cast("date"), $"d").as("dt"))
      df.select($"dt", weekday($"dt").as("w")).collect().forall { r =>
        r.getInt(1) == r.getDate(0).toLocalDate.getDayOfWeek.getValue - 1
      }
    }
}
