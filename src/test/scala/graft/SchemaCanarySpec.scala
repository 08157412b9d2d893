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
