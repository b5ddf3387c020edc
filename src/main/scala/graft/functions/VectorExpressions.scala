package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns.
  *
  * The hot loop of every similarity / ANN operator. The composable
  * alternative — `aggregate(zip_with(a, b, _*_), 0D, _+_)` — allocates an
  * intermediate array per row pair and interprets two lambdas per element;
  * measured at sf0.1 this made the brute-force NN scan ~20× slower than the
  * fused loop below. A codegen'd BinaryExpression keeps the whole comparison
  * kernel inside whole-stage codegen: no allocation, no virtual calls, plain
  * fused multiply-adds over the columnar array data.
  *
  * Summation is sequential in element order — bit-identical to the
  * left-fold of the `aggregate` form and of DuckDB's list_sum over the same
  * doubles, which the correctness oracle relies on.
  *
  * Elements are assumed non-null (enforced upstream: vectors are built with
  * `transform(embedding, x -> cast(x as double))` from non-null floats).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native popcount-of-AND over two `array<bigint>` bitmap columns:
  * Σᵢ bit_count(a[i] & b[i]) — the set-intersection cardinality when the
  * arrays are dictionary bitmaps. Same rationale as [[DotProduct]]: the
  * composable `aggregate(zip_with(...))` form falls out of whole-stage
  * codegen (HigherOrderFunction is interpreted) and costs ~7µs per pair;
  * this fused loop runs at memory speed, which is what makes bitmap
  * verification of millions of near-dup candidate pairs cheap.
  */
case class PopcountAnd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_popcnt_and requires two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_popcnt_and"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($x.getLong($i) & $y.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two SORTED, DISTINCT `array<bigint>`
  * columns: a two-pointer merge — zero allocation, zero hashing, one pass.
  * Contract (private kernel, enforced by its call sites, not at runtime):
  * both arrays ascending with no duplicate elements — exactly what
  * [[graft.queries.PipelineQueries.packedGrams]] emits — under which the
  * merge count equals `size(array_intersect(a, b))`, which builds a hash
  * set AND materializes the intersection array per pair only to take its
  * length (measured on d4b's verify stage: millions of candidate pairs ×
  * one array allocation each, visible as aggregate task GC). Same
  * rationale as [[PopcountAnd]]: the fused loop runs at memory speed
  * inside whole-stage codegen.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull arrays are REJECTED at analysis, not silently mangled:
    // the kernel's getLong on a null element reads garbage/0 and would
    // undercount where array_intersect raises a type-level error. The
    // sorted/distinct precondition itself is not checkable statically —
    // the registry docstring and the call sites own it.
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, false) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_count requires two array<bigint> arguments " +
        s"with non-null elements (and each array SORTED ascending and " +
        s"DISTINCT — unsorted/duplicated input silently undercounts), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { s += 1; i += 1; j += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $s++; $i++; $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Probe of a serialized Count-Min sketch: `graft_cms_estimate(cms, key)` →
  * the sketch's (over-)estimate of key's frequency. The sketch argument must
  * be foldable (a binary literal produced by `count_min_sketch(...)` and
  * collected once on the driver — a few hundred KB independent of data
  * volume), so it is deserialized ONCE per expression instance and shared as
  * a codegen reference object; the per-row work is d hash probes, inside
  * whole-stage codegen. Key hashing mirrors `CountMinSketchAgg.update`
  * exactly: integral types through the long path, strings through their
  * UTF-8 bytes — a mismatch here would silently probe different counters
  * than the aggregate updated.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.util.sketch.CountMinSketch

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate requires a foldable binary sketch as its first argument")
    else right.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate cannot probe a ${dt.sql} key")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bf: Any, v: Any): Any = right.dataType match {
    case LongType => sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Long]))
    case IntegerType => sketch.estimateCount(java.lang.Long.valueOf(v.asInstanceOf[Int].toLong))
    case StringType => sketch.estimateCount(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => right.dataType match {
      case LongType | IntegerType =>
        s"${ev.value} = $ref.estimateCount((Object) java.lang.Long.valueOf((long) $v));"
      case StringType =>
        s"${ev.value} = $ref.estimateCount((Object) $v.getBytes());"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Registers the library's native functions on the session so plans can use
    * them via `expr(...)` / `call_function(...)`. Idempotent; called from
    * Tables.configure so every entry point (Verify/Bench/specs) gets them.
    *
    *  - `graft_dot(a, b)`, `graft_popcnt_and(a, b)` — the codegen'd kernels
    *    above;
    *  - `graft_bloom_agg(key, n_items)` / `graft_bloom_contains(bf, key)` —
    *    Spark's own Catalyst bloom-filter pair (the machinery behind runtime
    *    row-level join filtering), exposed as callable functions so a query
    *    can build an explicit semi-join pre-filter: aggregate the build side
    *    into a compact bitset once, then probe it as a codegen'd predicate on
    *    the scan side before the shuffle (see RelationalQueries.j8BloomSemi).
    */
  /** Single source of truth for the function surface — consumed both by
    * [[register]] (temp functions on an existing session) and by
    * [[graft.GraftExtensions]] (the `spark.sql.extensions` injection route).
    */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_popcnt_and" -> (exprs => PopcountAnd(exprs(0), exprs(1))),
    "graft_sorted_intersect_count" -> (exprs =>
      SortedIntersectCount(exprs(0), exprs(1))),
    "graft_bloom_agg" -> (exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1))),
    "graft_bloom_contains" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))),
    "graft_cms_estimate" -> (exprs => CmsEstimate(exprs(0), exprs(1))),
    "graft_bitmap_distinct" -> (exprs => BitmapDistinct(exprs(0))
      .toAggregateExpression()),
    "graft_canonical_url" -> (exprs => CanonicalUrl(exprs(0))),
    "graft_strip_html" -> (exprs => HtmlText(exprs(0))),
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
