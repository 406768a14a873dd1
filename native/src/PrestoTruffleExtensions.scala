/*
 * Catalyst extension for presto_truffle_spark (SURVEY.md §4.3).
 *
 * The one §4.3 bullet that genuinely wants a Scala `Rule[LogicalPlan]`
 * rather than a DataFrame-level rewrite: selectivity/cost-ordered
 * conjuncts. Catalyst's optimizer pushes and merges Filter predicates
 * but evaluates an `And` chain left-to-right exactly as written, so a
 * query spelled `expensive_regex(s) AND cheap_range(x)` pays the regex
 * on every row even though the range check would short-circuit most of
 * them. At 100 TB, conjunct order inside the fused whole-stage-codegen
 * loop is a first-order cost.
 *
 * `ReorderCheapConjuncts` reorders the deterministic conjuncts of every
 * Filter by a static cost rank (comparisons < arithmetic < string
 * prefix/suffix ops < LIKE < regex < UDFs), leaving anything
 * non-deterministic strictly in place (reordering around a
 * non-deterministic predicate would change observable evaluation
 * counts). `And` is commutative in SQL three-valued logic for
 * deterministic operands — the same legality argument Catalyst's own
 * PushDownPredicates relies on when it splits and re-nests conjuncts —
 * so the rewrite is semantics-preserving by construction; the sort is
 * stable so equal-cost conjuncts keep their written order.
 *
 * Also injects `cents(x)` — the repo-wide exact-cents convention
 * `CAST(floor(x * 100 + 0.5) AS BIGINT)` (FIXTURES.md) — as a native
 * SQL function, demonstrating the expression-injection half of the
 * SparkSessionExtensions surface. The builder composes existing
 * catalyst expressions, so it inherits whole-stage codegen untouched.
 *
 * Built by tools/build_native.sh with the Scala compiler BUNDLED in the
 * Spark distribution (no external toolchain). Loaded via
 *   spark.jars=native/presto-truffle-ext.jar
 *   spark.sql.extensions=prestotruffle.PrestoTruffleExtensions
 * Driver sessions are vanilla and never need this jar: every registered
 * query uses pure DataFrame/SQL. The extension is the engine-internal
 * optimization layer, verified by tools/native_ext_check.py in its own
 * session (tests/test_native_ext.py).
 */
package prestotruffle

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, NumericType, TimestampNTZType, TimestampType}

/** Native vector dot product over array<float> / array<double> columns.
 *
 *  The similarity family's hot inner loop: the pure-SQL spelling
 *  `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
 *  allocates an intermediate array and dispatches two interpreted
 *  lambdas PER ELEMENT; this expression is one fused primitive loop
 *  over the two ArrayData buffers, with whole-stage codegen emitting
 *  the loop inline into the enclosing stage. At 100 TB × 1024-dim
 *  embeddings that per-element interpreter dispatch is the dominant
 *  cost of a brute-force or IVF-probe scan.
 *
 *  Null semantics: NULL if either side is NULL (standard binary
 *  expression); mismatched lengths raise — a silent truncation would
 *  corrupt similarity scores.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == FloatType || a == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two arrays of matching float/double " +
            s"element type, got ${left.dataType.sql} and ${right.dataType.sql}"
        )
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"$prettyName: length mismatch ${n} vs ${b.numElements()}"
      )
    }
    var s = 0.0d
    var i = 0
    if (elemType == FloatType) {
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (double) $a.$get($i) * (double) $b.$get($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProduct = copy(left = newLeft, right = newRight)
}

/** Fused exact-Jaccard over two string arrays (the dedup verify kernel).
 *
 *  The pure-SQL spelling of the LSH/prefix/SNM families' verification,
 *  `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`,
 *  evaluates ArrayIntersect — which builds a per-row hash set AND
 *  materializes the intersection as a new array — and, where
 *  subexpression elimination doesn't fire (filter + projection copies),
 *  evaluates it twice. This expression computes
 *  |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)| in ONE
 *  hash pass with no intermediate array.
 *
 *  Semantics match the catalyst set functions': a NULL *element* is a
 *  distinguished value (present in both sides ⇒ counted in the
 *  intersection, same as array_intersect); duplicates collapse
 *  (distinct-set semantics, same as array_intersect/array_union); a
 *  NULL *array* on either side yields NULL (binary expression), and an
 *  empty union (both arrays empty) yields NULL — where the SQL
 *  spelling's 0/0 would raise under ANSI integer division or yield NaN
 *  after a double cast, neither of which is a usable similarity.
 *  CodegenFallback: the per-row hash set dominates; stage fusion
 *  around it is preserved.
 */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sets"

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> arguments, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}"
        )
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var aNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var bNull = false
    var inter = 0L
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else {
        val v = b.getUTF8String(i)
        if (seenB.add(v) && setA.contains(v)) inter += 1
      }
      i += 1
    }
    if (aNull && bNull) inter += 1
    val da = setA.size.toLong + (if (aNull) 1L else 0L)
    val db = seenB.size.toLong + (if (bNull) 1L else 0L)
    val union = da + db - inter
    if (union == 0L) null else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): JaccardSets = copy(left = newLeft, right = newRight)
}

object ReorderCheapConjuncts extends Rule[LogicalPlan] {

  /** Static cost rank of one conjunct: dominated by the most expensive
   *  node it contains, tie-broken by tree size (smaller first). */
  private def cost(e: Expression): Long = {
    var worst = 1L
    var nodes = 0L
    e.foreach { n =>
      nodes += 1
      val c: Long = n match {
        case _: UserDefinedExpression => 1000000L // ScalaUDF / PythonUDF
        case _: RLike | _: RegExpReplace | _: RegExpExtract |
            _: RegExpExtractAll       => 10000L // regex machinery
        case _: HigherOrderFunction   => 2000L // per-element lambda dispatch
        case _: Like | _: LikeAll | _: LikeAny | _: StringSplit => 1000L
        case _: Contains | _: StartsWith | _: EndsWith => 100L
        case _: In | _: InSet         => 10L
        case _                        => 1L
      }
      if (c > worst) worst = c
    }
    worst * 1000L + math.min(nodes, 999L)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond @ And(_, _), child) if cond.deterministic =>
      val conjuncts = splitConjuncts(cond)
      val ordered   = conjuncts.sortBy(cost) // stable: ties keep order
      if (ordered == conjuncts) f
      else Filter(ordered.reduceLeft(And), child)
  }
}

/** Rewrite an equi-key-less interval join into a bin-bucketed equi-join
 *  (SURVEY §4.3 bullet 2, the rule-form half: "optionally a custom rule
 *  rewriting an as-of/range pattern to [the bucketed range join]").
 *
 *  `a JOIN b ON a.p >= b.lo AND a.p <= b.hi` has no equi-conjunct, so
 *  Spark's join selection falls through to BroadcastNestedLoopJoin (or a
 *  cartesian product) — O(|a|·|b|) comparisons, the canonical 100 TB
 *  scale-killer. With a user-declared bin width W
 *  (`spark.prestotruffle.rangeJoin.binSize`, same contract as the
 *  published Databricks range-join hint), the rule rewrites to:
 *
 *    point side     + __pt_bin   = floor(double(p)  / W)
 *    interval side  × explode(sequence(floor(double(lo)/W),
 *                                      floor(double(hi)/W)))
 *    JOIN ON __pt_bin = __pt_bin_r AND <original condition>
 *
 *  Correctness: bin(x) = floor(double(x)/W) composes monotone
 *  non-decreasing maps (long→double rounding, divide by W>0, floor), so
 *  lo ≤ p ≤ hi ⇒ bin(p) ∈ [bin(lo), bin(hi)] — the equi-join keeps every
 *  true match (no false negatives even where double loses integer
 *  precision: all three values go through the SAME monotone map), and
 *  the re-applied original predicate removes the bin-collision false
 *  positives. Each left row carries exactly one bin and matches exactly
 *  one exploded copy of a satisfying right row, so multiplicity is
 *  preserved. Intervals with lo > hi or NULL endpoints match nothing in
 *  both plans (empty/NULL sequence explodes to zero rows). Oversized bin
 *  counts fail loudly in Sequence's array-length check rather than
 *  silently exploding.
 *
 *  Shared by two rules: `BinRangeJoin` fires only on INNER joins whose
 *  deterministic condition has NO cross-side equality conjunct (the
 *  guard doubles as idempotence inside Catalyst's fixed-point batch —
 *  the rewritten join HAS one); `BinKeyedRangeJoin` is the keyed/as-of
 *  complement that REQUIRES an equi conjunct and guards idempotence via
 *  the rewrite's marker columns instead.
 */
private[prestotruffle] object BinJoinSupport {

  private def binnable(t: DataType): Boolean = t match {
    case _: NumericType                     => true
    case TimestampType | TimestampNTZType   => true
    case _                                  => false
  }

  // TimeZoneAwareExpressions (Cast where tz-sensitive, Sequence) are
  // UNRESOLVED until timeZoneId is set — an optimizer rule runs after
  // analysis, so it must thread the session zone itself.
  //
  // TIMESTAMP_NTZ cannot cast to DOUBLE directly (DATATYPE_MISMATCH on
  // Spark 4) — it goes through TIMESTAMP first, with the cast's zone
  // pinned to UTC: a session-zone NTZ→LTZ conversion would be
  // NON-monotone across DST fall-back (naive times repeat, the mapped
  // instant steps backward), and the whole correctness argument rests
  // on all three of p/lo/hi sharing one MONOTONE map. UTC has no
  // transitions, so the pinned cast is order-preserving and the binning
  // zone-free regardless of what zone the session runs in.
  private def bin(e: Expression, w: Double, tz: String): Expression = {
    val numeric = e.dataType match {
      case TimestampNTZType =>
        Cast(Cast(e, TimestampType, Some("UTC")), DoubleType, Some("UTC"))
      case _ => Cast(e, DoubleType, Some(tz))
    }
    Cast(Floor(Divide(numeric, Literal(w))), LongType, Some(tz))
  }

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** (small, big) pairs asserted `small <= big` (or <) by one conjunct. */
  private def lowerBounds(c: Expression): Seq[(Expression, Expression)] =
    c match {
      case LessThanOrEqual(a, b)    => Seq((a, b))
      case LessThan(a, b)           => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b)        => Seq((b, a))
      case _                        => Seq.empty
    }

  def hasCrossSideEqui(
      conjuncts: Seq[Expression],
      sideOf: Expression => Option[Boolean]
  ): Boolean = conjuncts.exists {
    case EqualTo(a, b) =>
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _                  => false
      }
    case EqualNullSafe(a, b) =>
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _                  => false
      }
    case _ => false
  }

  def sideResolver(
      left: LogicalPlan,
      right: LogicalPlan
  ): Expression => Option[Boolean] = { e =>
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  /** The shared bin rewrite: find one (lo ≤ p ≤ hi) cross-side range
   *  pair in `cond` and turn the join into an equi-join on bin numbers
   *  (point side projects its one bin; interval side explodes its bin
   *  range; the FULL original condition — including any equi-key
   *  conjuncts the caller allowed through — is re-applied on top).
   *  Returns None when no binnable pair exists. */
  def rewriteWithBins(
      j: Join,
      w: Double,
      tz: String
  ): Option[LogicalPlan] = {
    val Join(left, right, Inner, Some(cond), hint) = j
    val sideOf = sideResolver(left, right)
    val conjuncts = splitConjuncts(cond)
    val les = conjuncts.flatMap(lowerBounds)
    // find (lo <= p) and (p <= hi): p one side, lo & hi the other
    val rewrite = les.iterator.flatMap { case (lo, p) =>
      les.collect {
        case (p2, hi)
            if p.semanticEquals(p2) &&
              binnable(p.dataType) && binnable(lo.dataType) &&
              binnable(hi.dataType) &&
              sideOf(p).isDefined && sideOf(lo).isDefined &&
              sideOf(lo) == sideOf(hi) && sideOf(p) != sideOf(lo) =>
          (p, lo, hi, sideOf(p).get)
      }
    }.toSeq.headOption
    rewrite.map { case (p, lo, hi, pOnLeft) =>
      val (pointChild, ivalChild) =
        if (pOnLeft) (left, right) else (right, left)
      val binAlias = Alias(bin(p, w, tz), "__pt_bin")()
      val newPoint =
        Project(pointChild.output :+ binAlias, pointChild)
      val seq = new Sequence(
        bin(lo, w, tz), bin(hi, w, tz), Some(Literal(1L)), Some(tz))
      val genOut =
        AttributeReference("__pt_bin_r", LongType, nullable = false)()
      // Sequence THROWS on start > stop with step 1, so drop
      // inverted / NULL-endpoint intervals up front — they match
      // nothing under an inner join (p >= lo AND p <= hi is
      // unsatisfiable or NULL). bin() is monotone, so no
      // satisfiable interval is dropped.
      val satisfiable =
        Filter(LessThanOrEqual(bin(lo, w, tz), bin(hi, w, tz)), ivalChild)
      val newIval = Generate(
        Explode(seq), Nil, outer = false, None, Seq(genOut), satisfiable)
      val (newLeft, newRight) =
        if (pOnLeft) (newPoint, newIval) else (newIval, newPoint)
      val newCond =
        And(EqualTo(binAlias.toAttribute, genOut), cond)
      val binned = Join(newLeft, newRight, Inner, Some(newCond), hint)
      binned.setTagValue(BINNED, ())
      Project(j.output, binned)
    }
  }

  /** Idempotence marker for the keyed rule (whose OUTPUT still has an
   *  equi conjunct, so the absence-of-equi guard can't be reused), set
   *  on the rewritten Join node itself. A TreeNodeTag survives
   *  makeCopy/withNewChildren and transform (Catalyst copies tags onto
   *  replacement nodes), and — unlike the r7 column-NAME sniff — can
   *  never collide with a user column that happens to be called
   *  `__pt_bin` (tools/native_ext_check.py exercises that case). */
  val BINNED: TreeNodeTag[Unit] = TreeNodeTag[Unit]("prestoTruffle.binnedRangeJoin")
}

object BinRangeJoin extends Rule[LogicalPlan] {

  private val BIN_SIZE_KEY = "spark.prestotruffle.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(BIN_SIZE_KEY, "0").toDouble
      catch { case _: NumberFormatException => 0.0 }
    if (!(w > 0)) return plan

    plan transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic && j.resolved &&
            !BinJoinSupport.hasCrossSideEqui(
              BinJoinSupport.splitConjuncts(cond),
              BinJoinSupport.sideResolver(left, right)) =>
        BinJoinSupport
          .rewriteWithBins(j, w, conf.sessionLocalTimeZone)
          .getOrElse(j)
    }
  }
}

/** Keyed/as-of variant of `BinRangeJoin` (the remaining SURVEY §4.3
 *  as-of bullet in rule form): fires on inner joins that DO have a
 *  cross-side equi-key conjunct alongside a bounded range pair — the
 *  event-time as-of-with-tolerance shape
 *
 *    q JOIN r ON q.key = r.key
 *              AND r.ts >= q.ts - tol AND r.ts <= q.ts
 *
 *  (every tolerance-bounded as-of join's candidate-generation step; the
 *  top-1-per-row argmax above it is unchanged). Spark's join selection
 *  sees the equi-key and picks a sort-merge/hash join on `key` ALONE,
 *  evaluating the range as a post-join filter — per-key-group cartesian
 *  cost, which is quadratic exactly when keys are low-cardinality
 *  (symbols, tenants, devices) and each key carries millions of rows.
 *  Adding the bin number to the join key bounds each group to rows in
 *  overlapping bins: cost drops from Σ_k |q_k|·|r_k| to
 *  Σ_(k,bin) |q_(k,bin)|·|r_(k,bin)| ≈ matches.
 *
 *  Same monotone-map correctness argument and rewrite as BinRangeJoin
 *  (the re-applied original condition carries the equi keys through
 *  the new join). Idempotence needs its own guard — the rewritten join
 *  still HAS equi conjuncts — so `rewriteWithBins` tags the Join it
 *  emits with `BinJoinSupport.BINNED` and the rule skips tagged nodes;
 *  a user column that is legitimately NAMED `__pt_bin` no longer
 *  suppresses the rewrite. Opt-in via its own conf, like the published
 *  range-join hints. */
object BinKeyedRangeJoin extends Rule[LogicalPlan] {

  private val BIN_SIZE_KEY = "spark.prestotruffle.keyedRangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(BIN_SIZE_KEY, "0").toDouble
      catch { case _: NumberFormatException => 0.0 }
    if (!(w > 0)) return plan

    plan transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if cond.deterministic && j.resolved &&
            j.getTagValue(BinJoinSupport.BINNED).isEmpty &&
            BinJoinSupport.hasCrossSideEqui(
              BinJoinSupport.splitConjuncts(cond),
              BinJoinSupport.sideResolver(left, right)) =>
        BinJoinSupport
          .rewriteWithBins(j, w, conf.sessionLocalTimeZone)
          .getOrElse(j)
    }
  }
}

class PrestoTruffleExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => ReorderCheapConjuncts)
    ext.injectOptimizerRule(_ => BinRangeJoin)
    ext.injectOptimizerRule(_ => BinKeyedRangeJoin)
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("jaccard_sets"),
        new ExpressionInfo(classOf[JaccardSets].getName, "jaccard_sets"),
        (args: Seq[Expression]) => JaccardSets(args(0), args(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("cents"),
        new ExpressionInfo(
          classOf[PrestoTruffleExtensions].getName,
          "cents"
        ),
        // Deliberately DOUBLE-space (args cast up front): the repo's
        // cents convention targets double-typed parquet columns, and an
        // explicit cast keeps behavior identical whether the caller
        // hands a double, decimal literal, or int — no silent exact
        // decimal arithmetic on literals that real columns never get.
        (args: Seq[Expression]) =>
          Cast(
            Floor(
              Add(
                Multiply(
                  Cast(args.head, org.apache.spark.sql.types.DoubleType),
                  Literal(100.0d)
                ),
                Literal(0.5d)
              )
            ),
            LongType
          )
      )
    )
  }
}
