package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-duplicate collapse around a pairwise near-dup kernel — the
  * standard production prefix for dedup at corpus scale.
  *
  * Near-dup pair generation (LSH bucket joins, deletion-signature
  * joins, shared-shingle joins) is the one place where exact
  * duplicates make a linear pipeline quadratic: a class of n identical
  * inputs collides in EVERY bucket, so its candidate pairs grow as n²
  * while the data grows as n (a 10× duplicated corpus pays 100× in the
  * bucket self-joins). Every kernel here scores pairs through a
  * function of the row's CONTENT only (signature, shingle multiset,
  * embedding), so collapsing value-identical rows to one
  * representative, running the kernel on representatives, and
  * expanding rep pairs back to member pairs afterwards yields the
  * byte-identical pair set at unique-input cost; the n² term survives
  * only in the final expansion, whose size is the OUTPUT size (those
  * duplicate pairs are genuine near-dup results that must be emitted
  * regardless).
  *
  * Mechanics: the representative is min(id) over rows equal on the
  * collapse key; membership stays a (rep, member) ROW relation — never
  * a collected array, so a key duplicated millions of times costs rows,
  * not one giant driver-visible list. Expansion joins each side of a
  * rep pair to its members, keeps x<y once per unordered pair (self
  * rep-pairs enumerate in-group combinations; cross rep-pairs orient
  * by least/greatest — exactly the a<b convention the kernels emit).
  */
object ExactCollapse {

  /** Tag each row of `df` with `__rep` = min(idCol) over rows equal on
    * `by`. One hash-partitioned window (no global sort). The result is
    * materialized once: it always feeds at least two consumers (reps +
    * members). */
  def tag(df: DataFrame, idCol: String, by: Seq[Column]): DataFrame =
    graft.Graft.materialize(
      df.withColumn("__rep", min(col(idCol)).over(Window.partitionBy(by: _*))))

  /** Representative rows (id == rep), original schema. */
  def reps(tagged: DataFrame, idCol: String): DataFrame =
    tagged.filter(col(idCol) === col("__rep")).drop("__rep")

  /** (__rep, __member) membership relation, one row per input row. */
  def members(tagged: DataFrame, idCol: String): DataFrame =
    tagged.select(col("__rep"), col(idCol).as("__member"))

  /** (rep, rep) self-pairs for groups with ≥2 members — injected into a
    * kernel's candidate set so in-group duplicate pairs surface without
    * any bucket join. Callers apply their own eligibility the same way
    * they do for real candidates (e.g. by inner-joining signatures). */
  def dupSelfPairs(members: DataFrame, aCol: String, bCol: String): DataFrame =
    members.groupBy("__rep").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col("__rep").as(aCol), col("__rep").as(bCol))

  /** Expand rep-level pairs (aCol, bCol, carry...) to member-level pairs
    * with the kernel's a<b orientation, carry columns untouched. */
  def expand(repPairs: DataFrame, members: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val ma = members.select(col("__rep").as(aCol), col("__member").as("__ma"))
    val mb = members.select(col("__rep").as(bCol), col("__member").as("__mb"))
    val carry = repPairs.columns.filter(c => c != aCol && c != bCol)
    repPairs.join(ma, aCol).join(mb, bCol)
      .filter(col(aCol) =!= col(bCol) || col("__ma") < col("__mb"))
      .select(least(col("__ma"), col("__mb")).as(aCol) +:
        greatest(col("__ma"), col("__mb")).as(bCol) +:
        carry.map(col).toSeq: _*)
  }
}
