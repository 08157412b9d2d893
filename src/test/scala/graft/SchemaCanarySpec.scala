package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Canary specs for the two schema boundaries the driver has moved
  * under us twice (rounds 6-7): the testdata's `events.ts` physical
  * parquet type, and the timestamp logical type the Verify dump
  * writes. If either shifts again, ONE named test fails here instead
  * of 27 queries going red in the round gate. */
class SchemaCanarySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("testdata canary: Tables.events analyzes on every SF dir " +
    "present and ts is session-tz TimestampType") {
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
    assert(dirs.nonEmpty, "no testdata SF dirs found")
    for (dir <- dirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: ts is ${ev.schema("ts").dataType}")
      // force analysis + one batch through the reader
      assert(ev.limit(1).count() == 1L, s"$dir: events read no rows")
    }
  }

  test("testdata canary: EVERY table reader analyzes and returns a row " +
    "on every SF dir present (full-surface drift alarm)") {
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
    assert(dirs.nonEmpty, "no testdata SF dirs found")
    for (dir <- dirs; (name, rd) <- Tables.allReaders)
      assert(rd(spark, dir).limit(1).count() == 1L,
        s"$dir/$name: reader analyzed but returned no rows")
  }

  test("analysis canary: every registered query builds and analyzes " +
    "against the current testdata schemas (the round-7 failure class — " +
    "27 queries erroring on a schema drift — fails here by name first)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // constructing the DataFrame runs analysis; no execution
          // beyond the bounded build-time collects some queries do
          fn(spark, sf).queryExecution.analyzed
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("dtype snapshot canary: raw parquet dtypes of every testdata " +
    "column match the committed SCHEMAS.json (driver regeneration " +
    "drift fails here with a one-line diff naming the column)") {
    val path = java.nio.file.Paths.get("SCHEMAS.json")
    assert(java.nio.file.Files.exists(path),
      "SCHEMAS.json missing — run `sbt \"runMain graft.SchemaSnapshot\"`" +
        " and commit it")
    val committed = java.nio.file.Files.readString(path)
    val live = SchemaSnapshot.render(spark)
    if (live != committed) {
      val c = committed.linesIterator.toSet
      val l = live.linesIterator.toSet
      fail("testdata dtype drift vs committed SCHEMAS.json:\n" +
        (c -- l).toSeq.sorted.map("  was: " + _.trim).mkString("\n") + "\n" +
        (l -- c).toSeq.sorted.map("  now: " + _.trim).mkString("\n") +
        "\n(if intentional: sbt \"runMain graft.SchemaSnapshot\" + commit)")
    }
  }

  test("precision canary: money columns are exactly 2-decimal and " +
    "l_quantity is integral on every SF (the cents()/Decimal(38,0) " +
    "exactness contract — a finer-precision testdata regeneration " +
    "would silently quantize inputs; fail loudly here instead)") {
    // (table, column, kind): kind "cents" asserts floor(x*100+.5)/100
    // round-trips x exactly (x has <= 2 decimal digits); "int" asserts
    // floor(x) == x. These are the exact preconditions of Tables.cents
    // aggregation and statsCvOn's Decimal(38,0) cast of summed
    // quantities (ADVICE r8).
    val checks: Seq[(String, Seq[(String, String)])] = Seq(
      "lineitem" -> Seq("l_quantity" -> "int", "l_extendedprice" -> "cents",
        "l_discount" -> "cents", "l_tax" -> "cents"),
      "events"   -> Seq("value" -> "cents"),
      "orders"   -> Seq("o_totalprice" -> "cents"),
      "customer" -> Seq("c_acctbal" -> "cents"),
      "supplier" -> Seq("s_acctbal" -> "cents"),
      "part"     -> Seq("p_retailprice" -> "cents"))
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
    val readers = Tables.allReaders.toMap
    for (dir <- dirs; (table, cols) <- checks) {
      // one pass per table: count violations of every column at once
      val aggs = cols.map { case (cn, kind) =>
        val bad = kind match {
          case "int" => floor(col(cn)) =!= col(cn)
          case _     => floor(col(cn) * 100.0 + 0.5) / 100.0 =!= col(cn)
        }
        sum(when(bad, 1L).otherwise(0L)).as(cn)
      }
      val row = readers(table)(spark, dir)
        .agg(aggs.head, aggs.tail: _*).head()
      for (((cn, kind), i) <- cols.zipWithIndex)
        assert(row.getLong(i) == 0L,
          s"$dir/$table.$cn: ${row.getLong(i)} values violate " +
            s"$kind-exactness — testdata precision drifted; the " +
            "cents()/integral aggregation paths would quantize")
    }
  }

  test("dump canary: a TimestampType column written through the " +
    "Verify dump path reads back as TIMESTAMP_NTZ, not TIMESTAMPTZ") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dump_canary").toString
    val df = Seq((1L, Timestamp.valueOf("2024-06-01 12:34:56")))
      .toDF("id", "t")
      .withColumn("t", col("t").cast(TimestampType))
    Verify.dumpNtz(df).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/out")
    // With outputTimestampType=TIMESTAMP_MICROS a raw TimestampType
    // column would be stamped isAdjustedToUTC=true and read back as
    // TimestampType (TIMESTAMPTZ to DuckDB) — the round-6/7 schema
    // regression. The dump boundary must neutralize it to NTZ.
    val back = spark.read.parquet(s"$dir/out")
    assert(back.schema("t").dataType == TimestampNTZType,
      s"dump wrote ${back.schema("t").dataType}")
    assert(back.head.getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.of(2024, 6, 1, 12, 34, 56))
  }
}
