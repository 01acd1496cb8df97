package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property layer (SURVEY §5.2.3): invariants over generated micro-frames.
  * Plain ScalaCheck driven through Test.check (no scalatestplus bridge in
  * the offline dependency set). */
class PropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def holds(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  private val rows = Gen.listOfN(40,
    Gen.zip(Gen.choose(0, 5), Gen.choose(0, 10), Gen.choose(0.0, 100.0)))

  test("dedup is idempotent") {
    val s = spark; import s.implicits._
    holds(forAll(rows) { xs =>
      val once = xs.toDF("k", "g", "v").distinct()
      once.count() == once.distinct().count()
    })
  }

  test("semi-join bounded by left; inner bounded by |L|x|R|") {
    val s = spark; import s.implicits._
    holds(forAll(rows, rows) { (ls, rs) =>
      val l = ls.toDF("k", "g", "v")
      val r = rs.toDF("k", "g", "v")
      val semi = l.join(r.select("k").distinct(), Seq("k"), "left_semi").count()
      val inner = l.join(r, Seq("k")).count()
      semi <= l.count() && inner <= l.count() * r.count()
    })
  }

  test("row_number within [1, group size]") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    holds(forAll(rows) { xs =>
      val df = xs.toDF("k", "g", "v")
      val w = Window.partitionBy("g").orderBy(col("v"), col("k"))
      df.withColumn("rn", row_number().over(w))
        .groupBy("g").agg(max("rn").as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n")).count() == 0
    })
  }

  test("union-all multiplicity is additive") {
    val s = spark; import s.implicits._
    holds(forAll(rows, rows) { (ls, rs) =>
      val l = ls.toDF("k", "g", "v").select("k")
      val r = rs.toDF("k", "g", "v").select("k")
      l.union(r).count() == l.count() + r.count()
    })
  }

  // ---- round-5 algorithmic kernels over generated frames ----

  test("skyline window sweep equals brute-force Pareto dominance") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pts = Gen.listOfN(25, Gen.zip(Gen.choose(0, 15), Gen.choose(1, 8)))
    holds(forAll(pts) { xs =>
      val arr = xs.zipWithIndex.map { case ((pc, sz), i) =>
        (i.toLong, pc.toLong, sz)
      }
      val df = arr.toDF("id", "pc", "sz")
      val cheaper = Window.orderBy(col("pc").asc)
        .rangeBetween(Window.unboundedPreceding, -1)
      val got = df
        .withColumn("mlt", max(col("sz")).over(cheaper))
        .withColumn("meq", max(col("sz")).over(Window.partitionBy("pc")))
        .filter((col("mlt").isNull || col("sz") > col("mlt")) &&
          col("sz") === col("meq"))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = arr.filter { case (_, pc, sz) =>
        !arr.exists { case (_, pc2, sz2) =>
          pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
        }
      }.map(_._1).toSet
      got == want
    })
  }

  test("rank-selected doubled median is exactly 2x the true median") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Gen.nonEmptyListOf(Gen.choose(0, 9999)).map(_.take(21))
    holds(forAll(vals) { cents =>
      val df = cents.zipWithIndex
        .map { case (c, i) => (i.toLong, BigDecimal(c) / 100) }
        .toDF("id", "v")
        .select(col("id"), col("v").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      val w = Window.orderBy(col("v").asc_nulls_last, col("id").asc)
      val med2 = df
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(lit(1))))
        .filter(col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2)
        .agg((sum(col("v")) *
          when(max(col("n")) % 2 === 1, 2).otherwise(1)).as("m2"))
        .head().getDecimal(0)
      val sorted = cents.sorted.map(BigDecimal(_) / 100)
      val n = sorted.length
      val want =
        if (n % 2 == 1) sorted(n / 2) * 2
        else sorted(n / 2 - 1) + sorted(n / 2)
      BigDecimal(med2).compare(want) == 0
    })
  }

  test("islands via day-minus-rank equal a sequential fold") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val days = Gen.listOfN(18, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 12)))
    holds(forAll(days) { ud =>
      val dd = ud.map { case (u, d) => (u.toLong, d.toLong) }.distinct
      val w = Window.partitionBy("u").orderBy(col("d").asc)
      val got = dd.toDF("u", "d")
        .withColumn("grp", col("d") - row_number().over(w))
        .groupBy("u", "grp")
        .agg(min(col("d")).as("start"), count(lit(1)).as("len"))
        .select("u", "start", "len").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = dd.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
        xs.map(_._2).distinct.sorted
          .foldLeft(List.empty[(Long, Long, Long)]) {
            case ((uu, st, ln) :: rest, d) if d == st + ln =>
              (uu, st, ln + 1) :: rest
            case (acc, d) => (u, d, 1L) :: acc
          }
      }.toSet
      got == want
    })
  }

  test("dedupIncremental == full recluster on random corpora (round 15)") {
    val s = spark; import s.implicits._
    import graft.api.Graft
    // random (id, text) corpora from a 12-token pool (guarantees band
    // collisions AND batch-internal duplicate groups), ids unique, the
    // standing/batch split disjoint by construction — the documented
    // contract. 5 trials: each runs three CC engines (standing ingest,
    // the incremental merge, the full-recluster truth).
    val corpus = Gen.listOfN(24, Gen.zip(Gen.choose(0, 11),
      Gen.choose(0, 11), Gen.choose(0, 11)))
    val prop = forAll(corpus) { triples =>
      val docs = triples.zipWithIndex.map { case ((a, b, c), i) =>
        (i.toLong, s"t$a t$b t$c")
      }
      val standing = docs.filter(_._1 % 3 != 0)
      val batch = docs.filter(_._1 % 3 == 0)
      val labels0 = Graft.minhashClusters(
        standing.toDF("doc_id", "text"), "doc_id", "text")
      val bands0 = Graft.minhashBandRows(
        standing.toDF("doc_id", "text"), "doc_id", "text")
      val (l1, b1) = Graft.dedupIncremental(labels0, bands0,
        batch.toDF("doc_id", "text"), "doc_id", "text")
      val got = l1.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val want = Graft.minhashClusters(
          docs.toDF("doc_id", "text"), "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val wantBands = Graft.minhashBandRows(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.toString).toSet
      got == want &&
        b1.collect().map(_.toString).toSet == wantBands
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupIncremental changedOnly: delta MERGE equals the full " +
      "recluster on random corpora (round 16)") {
    val s = spark; import s.implicits._
    import graft.api.Graft
    // same corpus family as the full-state property above; here the
    // APPEND-SHAPED return is merged by hand exactly as a 100 TB
    // caller would (replace standing label rows by id, insert new
    // ids; append the batch band rows) and the reconstruction must
    // equal the full recluster of standing UNION batch
    val corpus = Gen.listOfN(24, Gen.zip(Gen.choose(0, 11),
      Gen.choose(0, 11), Gen.choose(0, 11)))
    val prop = forAll(corpus) { triples =>
      val docs = triples.zipWithIndex.map { case ((a, b, c), i) =>
        (i.toLong, s"t$a t$b t$c")
      }
      val standing = docs.filter(_._1 % 3 != 0)
      val batch = docs.filter(_._1 % 3 == 0)
      val labels0 = Graft.minhashClusters(
        standing.toDF("doc_id", "text"), "doc_id", "text")
      val bands0 = Graft.minhashBandRows(
        standing.toDF("doc_id", "text"), "doc_id", "text")
      val (ld, bd) = Graft.dedupIncremental(labels0, bands0,
        batch.toDF("doc_id", "text"), "doc_id", "text",
        changedOnly = true)
      val merged = labels0
        .join(ld.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionAll(ld)
      val got = merged.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val want = Graft.minhashClusters(
          docs.toDF("doc_id", "text"), "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val appended = bands0.collect().map(_.toString).toSet ++
        bd.collect().map(_.toString).toSet
      val wantBands = Graft.minhashBandRows(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.toString).toSet
      got == want && appended == wantBands
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
