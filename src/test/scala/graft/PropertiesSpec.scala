package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFns

/** Algebraic properties (SURVEY.md §5.3) over scalacheck-generated inputs —
  * the invariants that must hold for ANY data, not just the fixtures.
  * (No scalatest-plus bridge in the offline cache, so generators are
  * driven manually with deterministic seeds.) */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], runs: Int = 5)(body: A => Unit): Unit =
    (0 until runs).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val docGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" "))))

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    forAll(docGen) { docs =>
      val df = docs.toDF("text")
        .withColumn("norm", TextFns.normalize(col("text")))
      val once = df.dropDuplicates("norm")
      val twice = once.dropDuplicates("norm")
      assert(once.count() == twice.count())
      assert(once.select("norm").except(twice.select("norm")).isEmpty)
    }
  }

  test("broadcast hint never changes join results") {
    forAll(Gen.listOfN(20, Gen.chooseNum(0L, 5L))) { keys =>
      val fact = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "v")
      val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "name")
      val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      val hinted = fact.join(broadcast(dim), Seq("k")).select("k", "v", "name")
      assert(plain.except(hinted).isEmpty && hinted.except(plain).isEmpty)
      assert(plain.count() == hinted.count())
    }
  }

  test("sortWithinPartitions preserves the multiset of rows") {
    forAll(Gen.listOfN(40, Gen.chooseNum(-100, 100))) { xs =>
      val df = xs.toDF("x").repartition(4)
      val sorted = df.sortWithinPartitions("x")
      assert(sorted.count() == xs.length)
      val a = df.groupBy("x").count()
      val b = sorted.groupBy("x").count()
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    }
  }

  test("jaccard is symmetric and bounded in [0,1]; self-similarity is 1") {
    forAll(docGen) { docs =>
      val d = docs.filter(_.nonEmpty).distinct
      whenever(d.nonEmpty) {
        val df = d.toDF("text")
          .withColumn("s", array_distinct(split(col("text"), " ")))
          .select("s").limit(8)
        val pairs = df.as("x").crossJoin(df.as("y"))
          .select(TextFns.jaccard("x.s", "y.s").as("j_xy"),
            TextFns.jaccard("y.s", "x.s").as("j_yx"),
            (col("x.s") === col("y.s")).as("same"))
          .collect()
        pairs.foreach { r =>
          val (jxy, jyx, same) = (r.getDouble(0), r.getDouble(1), r.getBoolean(2))
          assert(jxy == jyx)
          assert(jxy >= 0.0 && jxy <= 1.0)
          if (same) assert(jxy == 1.0)
        }
      }
    }
  }
}
