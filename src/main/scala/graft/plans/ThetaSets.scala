package graft.plans

import graft.{Q, Tables}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta-sketch DISTINCT-SET ALGEBRA (scale ext.): union, intersection,
  * and difference over user sets, computed from mergeable sketches
  * instead of joins.
  *
  * [[graft.operators.AggQueries.aggHllMerge]] already ships the
  * re-aggregable distinct-count UNION; HLL stops there — an HLL sketch
  * cannot intersect or subtract. Theta sketches (a k-minimum-values
  * family) close the algebra: A∪B, A∩B, and A\B are all computable
  * from the compact sketches alone. That is the audience-overlap /
  * retention-overlap query at 100 TB: per-segment sketches are built
  * in one scan (map-side partial, only sketch bytes transit the
  * shuffle), persist at ~16 KB each, and ANY pairwise overlap question
  * over N segments is then answered from the sketch store without
  * touching raw data again — where the exact formulation re-shuffles
  * the full user corpus per question.
  *
  * Distributed shape: a typed [[Aggregator]] whose buffer holds a live
  * theta `Union` — per-row `update(long)` is a hash insert, and the
  * buffer serializes (Java-serialization hook → compact-sketch bytes)
  * only at partial/final aggregation boundaries, so the per-row path
  * never touches serialization. The per-day sketches collected to the
  * driver are bounded by |days in the probe| (two here) — the same
  * bounded-by-construction pattern as the IVF codebook — and the set
  * operations on them are O(sketch size), not O(data).
  *
  * Determinism/accuracy: below the nominal 4096 entries a theta sketch
  * retains EVERY hash, so estimates are exact and replayable (the test
  * SFs sit in this regime; PipelineSpec asserts exact equality there,
  * and 4% bounds on a planted 75k-id frame in estimation mode).
  * Rows-only for the driver, like the other sketch queries: the
  * estimation-mode result is a sketch internal, not ANSI SQL.
  */
object ThetaSets {

  /** Aggregation buffer: a live theta Union that serializes as its
    * compact-sketch bytes. `@transient` + lazy rebuild keeps the
    * off-heap-free heap union out of the serialized form. */
  final class ThetaBuf extends Serializable {
    @transient private var un: Union = SetOperation.builder().buildUnion()
    private def union: Union = {
      if (un == null) un = SetOperation.builder().buildUnion()
      un
    }
    def add(v: Long): ThetaBuf = { union.update(v); this }
    def mergeWith(o: ThetaBuf): ThetaBuf = { union.union(o.result); this }
    def result: CompactSketch = union.getResult

    @throws[java.io.IOException]
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = union.getResult.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    @throws[java.io.IOException]
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      un = SetOperation.builder().buildUnion()
      un.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    }
  }

  /** Typed theta-sketch aggregate: Long keys → compact-sketch bytes. */
  object ThetaAgg extends Aggregator[Long, ThetaBuf, Array[Byte]] {
    def zero: ThetaBuf = new ThetaBuf
    def reduce(b: ThetaBuf, v: Long): ThetaBuf = b.add(v)
    def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = a.mergeWith(b)
    def finish(b: ThetaBuf): Array[Byte] = b.result.toByteArray
    def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Core: sketch each segment of `(segment, id)` pairs, then answer
    * the full set algebra for segments `a` and `b` from the sketches
    * alone. Shared by the driver query and the planted-frame spec. */
  private[graft] def setopsOn(
      ev: Dataset[(String, Long)], a: String, b: String): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val sketches: Map[String, CompactSketch] = ev
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(ThetaAgg.toColumn.name("sk"))
      .collect() // bounded: one row per probed segment
      .map { case (k, bytes) =>
        k -> Sketches.wrapCompactSketch(Memory.wrap(bytes))
      }.toMap
    val skA = sketches(a)
    val skB = sketches(b)
    val un = SetOperation.builder().buildUnion()
    un.union(skA); un.union(skB)
    val inter = SetOperation.builder().buildIntersection().intersect(skA, skB)
    val aNotB = SetOperation.builder().buildANotB().aNotB(skA, skB)
    Seq(
      ("a_only", math.round(skA.getEstimate)),
      ("b_only", math.round(skB.getEstimate)),
      ("union", math.round(un.getResult.getEstimate)),
      ("intersect", math.round(inter.getEstimate)),
      ("a_not_b", math.round(aNotB.getEstimate))
    ).toDF("set_op", "n_users_est").orderBy(col("set_op"))
  }

  /** `agg_theta_setops`: day-over-day user overlap — actives on
    * 2024-01-01 vs 2024-01-02, with ∪ (either day), ∩ (retained), and
    * \ (churned from day 1) all read off the two sketches. */
  val aggThetaSetops: Q = (spark, dir) => {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .where(col("day").isin("2024-01-01", "2024-01-02"))
      .as[(String, Long)]
    setopsOn(ev, "2024-01-01", "2024-01-02")
  }

  /** Oracled EXACT companion of [[aggThetaSetops]] (round-9 sketch
    * anchoring): the same five set-algebra rows computed from exact
    * distinct-user flags — one distinct shuffle on (user, day-flags),
    * one global conditional aggregate, and a `stack` unpivot to the
    * sketch query's (set_op, count) shape. The DuckDB oracle verifies
    * these exactly; SketchBoundSpec then pins the theta estimates to
    * them at every SF (equality below the 4096-entry exact regime). */
  val aggThetaSetopsExact: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      .where(col("day").isin("2024-01-01", "2024-01-02"))
    val flags = ev.groupBy(col("user_id"))
      .agg(
        max(when(col("day") === "2024-01-01", 1).otherwise(0)).as("a"),
        max(when(col("day") === "2024-01-02", 1).otherwise(0)).as("b"))
    flags
      .agg(
        sum(col("a")).as("na"),
        sum(col("b")).as("nb"),
        count(lit(1)).as("nu"), // every row is in A∪B by the filter
        sum(col("a") * col("b")).as("ni"),
        sum(col("a") * (lit(1) - col("b"))).as("nd"))
      .selectExpr("stack(5, 'a_only', na, 'b_only', nb, 'union', nu, " +
        "'intersect', ni, 'a_not_b', nd) as (set_op, n_users)")
      .orderBy(col("set_op"))
  }

  def queries: Map[String, Q] = Map(
    "agg_theta_setops"       -> aggThetaSetops,
    "agg_theta_setops_exact" -> aggThetaSetopsExact)

  def oracles: Map[String, String] = Map(
    "agg_theta_setops_exact" ->
      """WITH ev AS (
        |  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id
        |  FROM events
        |  WHERE CAST(CAST(ts AS DATE) AS VARCHAR)
        |    IN ('2024-01-01', '2024-01-02')),
        |f AS (
        |  SELECT user_id,
        |    max(CASE WHEN day = '2024-01-01' THEN 1 ELSE 0 END) AS a,
        |    max(CASE WHEN day = '2024-01-02' THEN 1 ELSE 0 END) AS b
        |  FROM ev GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb,
        |    CAST(count(*) AS BIGINT) AS nu, CAST(SUM(a * b) AS BIGINT) AS ni,
        |    CAST(SUM(a * (1 - b)) AS BIGINT) AS nd
        |  FROM f)
        |SELECT set_op, n_users FROM (
        |  SELECT 'a_only' AS set_op, na AS n_users FROM t
        |  UNION ALL SELECT 'b_only', nb FROM t
        |  UNION ALL SELECT 'union', nu FROM t
        |  UNION ALL SELECT 'intersect', ni FROM t
        |  UNION ALL SELECT 'a_not_b', nd FROM t) s
        |ORDER BY set_op""".stripMargin)
}
