package graft

import graft.compile.Compiler
import graft.spec._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over random small datasets and configs
  * (SURVEY §5.3): aggregation conservation, filter partitioning, rename
  * bijectivity. Uses plain ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge artifact isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private val rowsGen: Gen[List[(String, Int, Double)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c", "d")
      id <- Gen.chooseNum(-1000, 1000)
      v <- Gen.chooseNum(-1000, 1000).map(_ / 8.0) // dyadic → exact sums
    } yield (k, id, v))

  test("groupBy sum conserves the total") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "id", "v")
      val grouped = Compiler.applyAggregate(df,
        AggregateSpec(Seq("k"), Seq(AggSpec("v", "sum", Some("sv")))))
      val total = grouped.agg(sum("sv")).collect().head.getDouble(0)
      assert(math.abs(total - rows.map(_._3).sum) < 1e-9)
    }
  }

  test("filter(p) and filter(not p) partition the rows") {
    forAll2(rowsGen, Gen.chooseNum(-100, 100)) { (rows, cut) =>
      val df = rows.toDF("k", "id", "v")
      val p = ColFilter("id", ">", JInt(cut))
      val notP = ColFilter("id", "<=", JInt(cut))
      val n1 = df.filter(Compiler.filterColumn(p)).count()
      val n2 = df.filter(Compiler.filterColumn(notP)).count()
      assert(n1 + n2 == rows.size)
    }
  }

  test("rename preserves row count and data, changes only the header") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "id", "v")
      val out = Compiler.compileNode(spark,
        NodeSpec(id = "n", rename = Seq("k" -> "key", "v" -> "value")),
        input = Some(df))
      assert(out.columns.toSeq == Seq("key", "id", "value"))
      assert(out.count() == rows.size)
      assert(out.agg(sum("value")).collect().head.getDouble(0) ==
        df.agg(sum("v")).collect().head.getDouble(0))
    }
  }

  test("cascade of two sum levels equals one global sum") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "id", "v")
      df.createOrReplaceTempView("prop_src")
      val out = Compiler.compile(spark, CascadePipeline(CascadeSpec(
        SourceSpec(table = Some("prop_src")),
        Seq(IterationSpec("i", Seq(
          NodeSpec(id = "l1", aggregate = Some(
            AggregateSpec(Seq("k"), Seq(AggSpec("v", "sum", Some("sv")))))),
          NodeSpec(id = "l2", aggregate = Some(
            AggregateSpec(Nil, Seq(AggSpec("sv", "sum", Some("total")))))))))
      )))
      val total = out.collect().head.getDouble(0)
      assert(math.abs(total - rows.map(_._3).sum) < 1e-9)
    }
  }

  test("filtered aggregate equals filter-then-aggregate") {
    forAll2(rowsGen, Gen.chooseNum(-50, 50)) { (rows, cut) =>
      val df = rows.toDF("k", "id", "v")
      val filteredAgg = Compiler.applyAggregate(df, AggregateSpec(
          Seq("k"), Seq(AggSpec("v", "sum", Some("sv"), filter = Some(s"id > $cut")))))
        .filter(col("sv").isNotNull)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val preFiltered = df.filter(col("id") > cut)
        .groupBy("k").agg(sum("v").as("sv"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(filteredAgg == preFiltered)
    }
  }
}
