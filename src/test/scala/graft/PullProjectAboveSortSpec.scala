package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.RegExpReplace
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.functions._

/** [[PullExpensiveProjectAboveSort]] — the optimizer rule that stops a
  * global sort's range-sampling pass from evaluating an expensive
  * projection twice. Shapes are asserted on the OPTIMIZED logical plan
  * (parquet-backed input: a LocalRelation would be folded away by
  * ConvertToLocalRelation before the shape could be observed). */
class PullProjectAboveSortSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")

  /** Pre-order Sort/Project skeleton of the optimized plan. */
  private def shape(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case _: Sort => "Sort"
      case _: Project => "Project"
    }

  private def heavyBelowSort(df: DataFrame): Boolean = {
    val sort = df.queryExecution.optimizedPlan.collectFirst {
      case s: Sort => s
    }.get
    sort.exists(_.expressions.exists(_.exists {
      case _: RegExpReplace => true
      case _ => false
    }))
  }

  test("heavy projection is pulled above a global sort on a raw column") {
    val df = docs
      .select($"doc_id", regexp_replace($"text", "\\s+", "_").as("r"))
      .orderBy($"doc_id")
    assert(shape(df).take(2) == Seq("Project", "Sort"), shape(df).toString)
    assert(!heavyBelowSort(df),
      "the sampling pass would re-evaluate the heavy projection")
  }

  test("a two-layer struct-kernel + extract stack is peeled whole") {
    val df = docs
      .select($"doc_id",
        struct(regexp_replace($"text", "[aeiou]", "").as("a"),
               regexp_replace($"text", "[0-9]", "").as("b")).as("g"))
      .select($"doc_id", $"g.a".as("a"), $"g.b".as("b"))
      .orderBy($"doc_id")
    assert(!heavyBelowSort(df), df.queryExecution.optimizedPlan.treeString)
    assert(shape(df).head == "Project")
  }

  test("a cheap-alias sort key is substituted so the pull-up still fires") {
    val df = docs
      .select($"doc_id" % 7 as "k",
        regexp_replace($"text", "\\s+", "_").as("r"))
      .orderBy($"k", $"r".isNull)
    // r itself is a sort key component? no — r.isNull references r, which
    // is HEAVY: the rule must decline. Split the two cases explicitly:
    val fired = docs
      .select($"doc_id" % 7 as "k",
        regexp_replace($"text", "\\s+", "_").as("r"))
      .orderBy($"k")
    assert(!heavyBelowSort(fired), fired.queryExecution.optimizedPlan.treeString)
    assert(shape(fired).take(2) == Seq("Project", "Sort"))
    // heavy sort key: keeps the materialize-below-sort shape
    assert(heavyBelowSort(df), df.queryExecution.optimizedPlan.treeString)
  }

  test("a heavy sort key keeps the projection below the sort") {
    val df = docs
      .select($"doc_id", regexp_replace($"text", "\\s+", "_").as("r"))
      .orderBy($"r")
    assert(shape(df).head == "Sort", shape(df).toString)
  }

  test("HOFs over bounded arrays are not heavy — no pull-up, no wider shuffle") {
    val df = docs
      .select($"doc_id",
        transform(array($"doc_id" + 1, $"doc_id" + 2), x => x * 2).as("t"))
      .orderBy($"doc_id")
    // measured on the packing family: shipping the array through the
    // exchange costs more than the (single) transform — the rule must
    // leave these plans alone
    assert(shape(df).head == "Sort", shape(df).toString)
  }

  test("rewrite preserves values AND row order exactly") {
    def q(): DataFrame = docs
      .select($"doc_id", regexp_replace($"text", "[aeiou]", "").as("t"))
      .orderBy($"doc_id")
    val withRule = q().collect().toSeq
    assert(shape(q()).take(2) == Seq("Project", "Sort")) // rule active
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "graft.PullExpensiveProjectAboveSort")
    try {
      assert(shape(q()).head == "Sort") // rule actually excluded
      assert(q().collect().toSeq == withRule)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }
}
