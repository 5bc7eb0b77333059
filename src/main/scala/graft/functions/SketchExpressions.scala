package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native sketch expressions over a BIGINT-array of token hashes.
  *
  * The higher-order-builtin formulations (`transform`/`aggregate`
  * lambdas, see TextFeatures) are semantically identical but evaluate
  * one interpreted lambda call per element per hash function — ~64×n
  * closure invocations per row for MinHash. These expressions run the
  * same arithmetic as a single fused loop under whole-stage codegen:
  * no lambdas, no intermediate arrays, no extra shuffle. Specs prove
  * bit-equality with the builtin forms (which the DuckDB oracle mirrors).
  */

/** 64-hash MinHash signature: sig_i = min over tokens of
  * (a_i·h + b_i) mod P with the seeded-random affine family of
  * TextFeatures.minhashA/B — TextFeatures.minhashSigSpark semantics.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Evaluates to null on an EMPTY input array (no tokens → no signature),
  // not only on a null input — without this override, null-aware rewrites
  // could miscompile and the codegen `isNull = true` branch under a
  // declared-non-nullable expression is a Janino error (ADVICE r3).
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val a = TextFeatures.minhashAArr
    val b = TextFeatures.minhashBArr
    val sig = Array.fill(TextFeatures.NumHashes)(Long.MaxValue)
    var k = 0
    while (k < n) {
      val h = arr.getLong(k)
      var i = 0
      while (i < TextFeatures.NumHashes) {
        val v = (a(i) * h + b(i)) % TextFeatures.P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val sig = ctx.freshName("sig")
        val k = ctx.freshName("k")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        val nh = TextFeatures.NumHashes
        val p = TextFeatures.P
        val aRef = ctx.addReferenceObj("minhashA", TextFeatures.minhashAArr, "long[]")
        val bRef = ctx.addReferenceObj("minhashB", TextFeatures.minhashBArr, "long[]")
        s"""
           |if ($c.numElements() == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  long[] $sig = new long[$nh];
           |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |  for (int $k = 0; $k < $c.numElements(); $k++) {
           |    long $h = $c.getLong($k);
           |    for (int $i = 0; $i < $nh; $i++) {
           |      long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
           |      if ($v < $sig[$i]) $sig[$i] = $v;
           |    }
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 32-bit SimHash fingerprint: bit j = sign of Σ_tokens (±1 by bit j of
  * the token hash) — TextFeatures.simhashSpark semantics.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    var k = 0
    while (k < arr.numElements()) {
      val h = arr.getLong(k)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      k += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val counts = ctx.freshName("counts")
        val k = ctx.freshName("k")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val fp = ctx.freshName("fp")
        s"""
           |int[] $counts = new int[32];
           |for (int $k = 0; $k < $c.numElements(); $k++) {
           |  long $h = $c.getLong($k);
           |  for (int $j = 0; $j < 32; $j++) {
           |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
           |  }
           |}
           |long $fp = 0L;
           |for (int $j = 0; $j < 32; $j++) {
           |  if ($counts[$j] > 0) $fp |= (1L << $j);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

/** Dot product of two DOUBLE arrays as one fused codegen loop —
  * bit-identical to the builtin-lambda form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * (same sequential left-fold order ⇒ same IEEE sum, so the DuckDB
  * oracle mirror is unchanged), but without the ~2n interpreted lambda
  * invocations and the intermediate product array per row. Null on
  * length mismatch, mirroring zip_with's null-padding semantics, and
  * null when either array holds a null element — the builtin fold's
  * `acc + NULL` poisons the whole sum to NULL, so we must too
  * (ADVICE r4: getDouble over a null slot would otherwise return an
  * undefined number and silently diverge from the oracle).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |if ($a.numElements() != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $a.numElements(); $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $acc; }
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object SketchExpressions {

  /** Idempotent registration of all native text/sketch expressions. */
  def register(spark: SparkSession): Unit = {
    CharRollingHash.register(spark)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head)
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children.head)
    )
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))
    )
  }
}
