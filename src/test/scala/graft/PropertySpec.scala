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

  private val hashFlipGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, for {
      h <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
        .map(_ & ((1L << 60) - 1))
      k <- Gen.chooseNum(0, 3)
      bits <- Gen.pick(k, 0 until 60)
    } yield (h, bits.foldLeft(h)((x, b) => x ^ (1L << b))))
      .suchThat(_.nonEmpty)

  property("pigeonhole blocking is recall-complete: ANY hamming<=3 pair " +
    "shares a key at level 2 AND at level 3 (randomized flip sets)") =
    forAll(hashFlipGen) { pairs =>
      val df = pairs.toDF("ha", "hb")
      Seq(2, 3).forall { lv =>
        df.select(arrays_overlap(
            operators.DedupQueries.pigeonholeKeys($"ha", lv),
            operators.DedupQueries.pigeonholeKeys($"hb", lv)).as("s"))
          .collect().forall(_.getBoolean(0))
      }
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

  // local tree learners (ml/LocalTrees.scala): plain generated-data
  // properties, no Spark involved — these run in-executor at scale
  private val regressionGen: Gen[List[(List[Double], Double)]] =
    Gen.listOfN(60, for {
      a <- Gen.chooseNum(-10.0, 10.0)
      b <- Gen.chooseNum(-10.0, 10.0)
      n <- Gen.chooseNum(-1.0, 1.0)
    } yield (List(a, b), a * 2 + b + n)).suchThat(_.size >= 10)

  property("RF predictions stay within the training label range " +
    "(averages of leaf means cannot extrapolate)") =
    forAll(regressionGen) { data =>
      val xs = data.map(_._1.toArray).toArray
      val y = data.map(_._2).toArray
      val b = ml.LocalTrees.binDataset(xs)
      val m = ml.LocalTrees.fitRf(b, y, xs.indices.toArray, 10, 4, seed = 42L)
      xs.forall(x => m.predict(x) >= y.min - 1e-9 && m.predict(x) <= y.max + 1e-9)
    }

  property("local RF and GBT fits are deterministic for a fixed seed") =
    forAll(regressionGen) { data =>
      val xs = data.map(_._1.toArray).toArray
      val y = data.map(_._2).toArray
      val b = ml.LocalTrees.binDataset(xs)
      val rows = xs.indices.toArray
      val rf1 = ml.LocalTrees.fitRf(b, y, rows, 8, 4, 7L)
      val rf2 = ml.LocalTrees.fitRf(b, y, rows, 8, 4, 7L)
      val g1 = ml.LocalTrees.fitGbt(b, xs, y, rows, 8, 3, 7L)
      val g2 = ml.LocalTrees.fitGbt(b, xs, y, rows, 8, 3, 7L)
      xs.forall(x => rf1.predict(x) == rf2.predict(x) &&
        g1.predict(x) == g2.predict(x))
    }

  property("GBT training reduces squared error vs the mean predictor") =
    forAll(regressionGen) { data =>
      val xs = data.map(_._1.toArray).toArray
      val y = data.map(_._2).toArray
      val b = ml.LocalTrees.binDataset(xs)
      val m = ml.LocalTrees.fitGbt(b, xs, y, xs.indices.toArray, 20, 3, 42L)
      val mean = y.sum / y.length
      val sseMean = y.map(v => (v - mean) * (v - mean)).sum
      val sseGbt = xs.indices.map { i =>
        val d = y(i) - m.predict(xs(i)); d * d
      }.sum
      sseGbt <= sseMean + 1e-9
    }

  private val tokenGen: Gen[List[String]] =
    Gen.listOfN(8, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .suchThat(_.size >= 3)

  property("shingleHashesMd5 matches an independent JVM md5 computation " +
    "(the replayable-oracle contract) and stays in [0, 2^60)") =
    forAll(tokenGen) { toks =>
      val df = List((1L, toks)).toDF("id", "toks")
      val got = df.select(
          functions.TextFunctions.shingleHashesMd5($"toks").as("sh"))
        .head.getSeq[Long](0)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = toks.sliding(3).map(_.mkString(" ")).toList.distinct.map {
        s =>
          val hex = md.digest(s.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16)
      }
      got == expect && got.forall(h => h >= 0L && h < (1L << 60))
    }

  property("hash10k is overflow-free (ANSI) for ARBITRARY long ids — " +
    "including Long.MinValue/MaxValue — lands in [0, 10000), and matches " +
    "an exact BigInt replay") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { x =>
      // ANSI mode means an overflowing intermediate would THROW here,
      // so mere evaluation at the extremes proves the r3 overflow fix
      val got = List(x).toDF("id")
        .select(operators.PipelineOps.hash10k($"id").as("h")).head.getLong(0)
      val bp = BigInt(1000000007L)
      val r = ((BigInt(x) mod bp) + bp) mod bp
      val s = (r * BigInt(2654435761L) + BigInt(104729L)) mod bp
      val expect = ((((s * s) mod bp) * s) mod bp) mod BigInt(10000)
      got == expect.toLong && got >= 0L && got < 10000L
    }

  property("mortonInterleave is a bijection on 16-bit pairs (deinterleave " +
    "recovers both coordinates) and its top two bits are the quadrant " +
    "bits — the property the z-order sink's two-axis pruning rests on") =
    forAll(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)) { (x, y) =>
      val z = List((x, y)).toDF("x", "y")
        .select(sources.SourceQueries.mortonInterleave($"x", $"y").as("z"))
        .head.getInt(0)
      val backX = (0 until 16).map(i => ((z >> (2 * i)) & 1) << i).sum
      val backY = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
      // bijection: both coordinates recover exactly; locality: the
      // z-value's top bits are y's and x's high bits, so any contiguous
      // z-range (one output file) confines BOTH axes to a half-plane
      backX == x && backY == y &&
        ((z >>> 31) & 1) == ((y >> 15) & 1) &&
        ((z >>> 30) & 1) == ((x >> 15) & 1)
    }

  property("TopKAgg is split-invariant: any partitioning of the input, " +
    "reduced partially and merged, equals sort-then-take — the exact " +
    "condition map-side partial aggregation relies on") =
    forAll(Gen.listOf(for {
      ck <- Gen.chooseNum(1L, 30L) // narrow key range forces revenue ties
      rc <- Gen.chooseNum(0L, 50L)
    } yield (ck, rc)), Gen.chooseNum(1, 5)) { (xs, nParts) =>
      import plans.TopK
      val truth = xs.sortWith((a, b) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
        .take(TopK.K)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val merged = parts.map(_.foldLeft(TopK.TopKAgg.zero)(TopK.TopKAgg.reduce))
        .foldLeft(TopK.TopKAgg.zero)(TopK.TopKAgg.merge)
      TopK.TopKAgg.finish(merged) == truth
    }

  property("hash10k is uniform over sequential ids: 1M ids fill all 10k " +
    "basis points, each within ~6 sigma of the mean") = {
    val counts = spark.range(1000000L)
      .select(operators.PipelineOps.hash10k($"id").as("h"))
      .groupBy($"h").count().collect()
    // mean 100 per bucket, Poisson sigma 10: [40, 160] is a >6-sigma
    // envelope — a structured-low-bits regression (the bug class the
    // cubing step exists to prevent) blows past it immediately
    org.scalacheck.Prop.propBoolean(counts.length == 10000 &&
      counts.forall { r =>
        val c = r.getLong(1); c >= 40L && c <= 160L
      })
  }

  // deterministic pseudo-vectors for the PqEncode replication: integer
  // hash → [-1, 1) doubles, no Random (seed-stability rule)
  private def pv(seed: Long, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val h = (seed * 2654435761L + i * 40503L) % 65536L
      (h.toDouble / 32768.0) - 1.0
    }

  property("pq_encode matches a driver-side argmin replication " +
    "(left-fold norms/dots, dist2 op order, ties to the lower code)") = {
    val dim = 16; val subs = 4; val subDim = dim / subs; val k = 8
    val vecs = (0L until 40L).map(s => s -> pv(s, dim))
    val codebook: Seq[Seq[Double]] =
      (0 until subs).flatMap(s => (0 until k).map(j =>
        pv(100 + j, dim).slice(s * subDim, (s + 1) * subDim)))
    val expected = vecs.map { case (id, v) =>
      id -> (0 until subs).map { s =>
        val sub = v.slice(s * subDim, (s + 1) * subDim)
        val sn2 = sub.foldLeft(0.0)((a, x) => a + x * x)
        val d2s = (0 until k).map { j =>
          val c = codebook(s * k + j)
          val dot = sub.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
          sn2 - 2.0 * dot + c.foldLeft(0.0)((a, x) => a + x * x)
        }
        d2s.zipWithIndex.minBy { case (d, j) => (d, j) }._2
      }.toList
    }.toMap
    val got = vecs.toDF("vec_id", "vec")
      .select($"vec_id", graft.functions.VectorExpressions.pq_encode(
        $"vec", typedLit(codebook), lit(subs)).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    got == expected
  }

  property("pq_encode exact-tie goes to the lower code id") = {
    // two identical centroids per subspace at positions 1 and 3 → any
    // vector equidistant to both must encode to 1, never 3
    val dim = 4; val subs = 2; val subDim = 2
    val c = Seq(9.0, 9.0)
    val far = Seq(-9.0, -9.0)
    val codebook: Seq[Seq[Double]] =
      Seq(far, c, far, c, far, c, far, c) // per subspace: far,c,far,c
    val got = Seq((1L, Seq(9.0, 9.0, 9.0, 9.0)))
      .toDF("vec_id", "vec")
      .select(graft.functions.VectorExpressions.pq_encode(
        $"vec", typedLit(codebook), lit(subs)).as("codes"))
      .head.getSeq[Int](0).toList
    org.scalacheck.Prop.propBoolean(got == List(1, 1))
  }
}
