package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pull an EXPENSIVE projection above a global sort.
  *
  * `Sort(global).child = Project(heavy exprs)` is the shape of almost
  * every "compute per-row features, order the output" query — and it
  * evaluates the heavy projection TWICE at any scale: a global sort is
  * planned as a range exchange, and `RangePartitioner` bounds are drawn
  * by a SAMPLING pass that executes the exchange's whole child
  * (reservoir-sampling per partition reads EVERY row), after which the
  * real map pass executes it again. For a projection of regex/HOF/text
  * kernels over a corpus, that is a full duplicate corpus-scale pass —
  * profiled locally as two serial stages of equal cost under each
  * `orderBy`.
  *
  * Rewrite: `Sort(order, Project(list, child))` →
  * `Project(list, Sort(order, child))` — valid because Project is
  * order-preserving and the output attributes (ids and schema) are
  * unchanged. The sampling pass then evaluates only `child` (the pruned
  * scan), and the heavy list is computed once, after the exchange.
  *
  * Guards:
  *  - only GLOBAL sorts (local sorts don't sample);
  *  - every sort-order expression must resolve against `child`'s output
  *    (a sort on a projected alias — order by a computed column — keeps
  *    the current shape: the compute is needed before the exchange);
  *  - the projection must be deterministic (reordering evaluation of
  *    nondeterministic expressions changes results);
  *  - at least one projected expression must be HEAVY (regex, split,
  *    higher-order function, UDF/invoke, or a graft text kernel):
  *    pulling up cheap arithmetic only widens the shuffle (the child's
  *    raw columns replace the projected ones) for no compute win — the
  *    trade this rule exists to make is "ship the raw column once vs
  *    compute the heavy expression twice".
  *
  * Injected through [[GraftExtensions]] into the operator-optimization
  * fixed point, so ColumnPruning keeps co-operating: the pruning
  * projects it inserts are attribute-only and never re-match (the rule
  * is idempotent — after the pull-up the node is `Project(Sort(...))`,
  * which the pattern does not match).
  */
object PullExpensiveProjectAboveSort extends Rule[LogicalPlan] {

  /** Heavy = expensive per INPUT BYTE, i.e. worth shipping the raw
    * column through the exchange to avoid computing twice: string
    * kernels (regex, split, tokenizers, fingerprints), UDFs and
    * JVM-invoke codecs. Higher-order functions over already-computed
    * arrays are deliberately NOT heavy: a transform/fold over a bounded
    * id array costs less than re-serializing the array through a wider
    * shuffle — measured as a 30-45% regression on the sequence-packing
    * family (q203/q208/q182) when HOFs counted as heavy. */
  private def isHeavy(e: Expression): Boolean = e.exists {
    case _: RegExpReplace | _: RegExpExtractBase | _: StringSplit => true
    case _: RLike | _: Like | _: MultiLikeBase => true
    case _: ScalaUDF => true
    case _: objects.Invoke | _: objects.StaticInvoke => true
    case _: graft.functions.WhitespaceTokens => true
    case _: graft.functions.WhitespaceTokenCount => true
    case _: graft.functions.PortableFingerprint => true
    case _: graft.functions.NormalizeText => true
    case _: graft.functions.WindowFingerprints => true
    case _: graft.functions.WinnowFingerprints => true
    case _ => false
  }

  /** The contiguous stack of deterministic Projects hanging under a
    * node, top first. Stops at the first non-Project (or any
    * nondeterministic list — reordering those changes results). A
    * struct-building kernel + field-extract idiom compiles to TWO
    * stacked Projects that CollapseProject rightly declines to merge
    * (merging would duplicate the struct), so the heavy expression
    * often hides one layer down. */
  private def projStack(p: LogicalPlan): Vector[Project] = p match {
    case pr @ Project(list, _) if list.forall(_.deterministic) =>
      pr +: projStack(pr.child)
    case _ => Vector.empty
  }

  /** Rewrite each sort-order expression through one projection layer:
    * attributes that are pass-through keep their id, CHEAP aliases are
    * substituted by their defining expression, and a HEAVY alias (or
    * anything else unresolvable) aborts — a substituted expression is
    * re-evaluated inside the exchange and the sort's comparator, so a
    * heavy sort key must stay materialized below the sort. */
  private def substLayer(order: Seq[SortOrder],
                         layer: Seq[NamedExpression]): Option[Seq[SortOrder]] = {
    val byId = layer.map(ne => ne.exprId -> ne).toMap
    var ok = true
    // manual recursion, NOT Expression.transform: transform descends
    // into the freshly substituted subtree, whose references belong to
    // the layer's CHILD (they resolve at the next layer down, or the
    // bottom plan) — visiting them against THIS layer's map would
    // spuriously abort every non-trivial alias substitution.
    def rewrite(e: Expression): Expression = e match {
      case ar: AttributeReference =>
        byId.get(ar.exprId) match {
          case Some(a: Alias) if !isHeavy(a.child) => a.child
          case Some(ar2: AttributeReference) => ar2
          case _ => ok = false; ar
        }
      case other => other.mapChildren(rewrite)
    }
    val next = order.map(rewrite(_).asInstanceOf[SortOrder])
    if (ok) Some(next) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Sort(order, true, p: Project, hint) if projStack(p).nonEmpty =>
      val stack = projStack(p)
      // Deepest depth first: peeling the whole stack moves the most
      // compute above the exchange (the sampling pass then reads only
      // the raw scan). Back off one layer at a time when a sort key
      // can't be substituted cheaply through the deeper layer.
      val rewritten = (stack.length to 1 by -1).iterator.flatMap { d =>
        val layers = stack.take(d)
        // fire only when the peeled layers hold a heavy expression
        // that is NOT a sort key (substitution failing on heavy sort
        // keys enforces the second half): those are the expressions
        // whose duplicate evaluation under range-sampling the pull-up
        // removes. Peeling cheap layers alone only widens the shuffle.
        if (!layers.exists(_.projectList.exists(isHeavy))) None
        else layers.foldLeft(Option(order))((acc, pr) =>
          acc.flatMap(substLayer(_, pr.projectList))).map { newOrder =>
          layers.foldRight(
            Sort(newOrder, global = true, layers.last.child, hint): LogicalPlan)(
            (pr, acc) => Project(pr.projectList, acc))
        }
      }.nextOption()
      rewritten.getOrElse(Sort(order, global = true, p, hint))
  }
}
