package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels (custom Catalyst Expressions).
  *
  * Catalyst's higher-order functions (zip_with + aggregate) evaluate
  * their lambda interpreted, once per element — two orders of magnitude
  * slower than a fused loop for 64-float embeddings. These expressions
  * generate a tight Java loop inside whole-stage codegen instead, so
  * vector similarity stays in the compiled hot path.
  *
  * Semantics: elements are read as float-or-double per the child array
  * type and folded left-to-right in double (bit-identical to the HOF
  * formulation they replace); null arrays → null; arrays of unequal
  * length → null (zip_with pads the shorter array with nulls, so the
  * HOF form also yields null there); array elements are assumed
  * non-null (embedding columns).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Unequal-length inputs yield null even when both children are
  // non-nullable, so the result is always nullable.
  override def nullable: Boolean = true

  protected def elemJava(arr: String, child: Expression, i: String): String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  protected def elemScala(arr: ArrayData, child: Expression, i: Int): Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }
}

/** dot(a, b) = Σ aᵢ·bᵢ; null when |a| ≠ |b|. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += elemScala(a, left, i) * elemScala(b, right, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${elemJava(a, left, i)} * ${elemJava(b, right, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖); 0.0 on zero norm (engine edge rule);
  * null when |a| ≠ |b|. */
case class CosineSim(left: Expression, right: Expression) extends VectorFold {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elemScala(a, left, i)
      val y = elemScala(b, right, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = ${elemJava(a, left, i)};
         |    double $y = ${elemJava(b, right, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def dot_native(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def cosine_native(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
}
