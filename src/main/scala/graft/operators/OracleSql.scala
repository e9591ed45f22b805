package graft.operators

/** Shared DuckDB oracle-SQL fragments for cross-engine numeric parity. */
object OracleSql {

  /** One CTE computing exact linear-interpolation percentiles with
    * Spark's evaluation chain, bit-for-bit (pinned by
    * PercentileParitySpec): position p·(n−1) over the non-null sorted
    * values; the sorted value ITSELF when the position lands on an
    * integer index or between two tied values (Spark's count-based
    * implementation short-circuits there); otherwise
    * (lo+1−pos)·a + (pos−lo)·b.
    *
    * DuckDB's builtin `quantile_cont` instead evaluates (1−f)·a + f·b,
    * which is NOT exactly `a` when the neighbors tie (0.95·x + 0.05·x
    * re-rounds x's last ulp) — the sf1-jitter gate caught
    * `c12_winsorize` flipping `clipped` on rows whose value sat exactly
    * on the percentile bound (cent-grid data makes such ties common).
    * Any oracle whose percentile feeds a COMPARISON against data
    * values, or whose p has a non-dyadic fraction, must use this chain
    * instead of quantile_cont. Medians are exempt: at p = 0.5 both
    * engines' chains reduce to 0.5·a + 0.5·b with exact coefficients,
    * and a tie gives 0.5·x + 0.5·x = x exactly.
    *
    * @param name     CTE name to emit
    * @param src      relation to read (table or prior CTE)
    * @param valExpr  value expression (NULLs excluded, like Spark)
    * @param partCols grouping columns (empty = one global row)
    * @param ps       (outputAlias, percentileLiteral) pairs; the literal
    *                 string must parse to the same double Spark uses
    *                 (e.g. "0.33")
    */
  def pctChain(name: String, src: String, valExpr: String,
      partCols: Seq[String], ps: Seq[(String, String)]): String = {
    val part = partCols.mkString(", ")
    val partSel = if (partCols.isEmpty) "" else s"$part, "
    val over = if (partCols.isEmpty) "" else s"PARTITION BY $part "
    val aggCols = ps.zipWithIndex.map { case ((_, p), i) =>
      s"""    ANY_VALUE($p * (n - 1)) AS pos$i,
         |    ANY_VALUE(FLOOR($p * (n - 1))) AS lo$i,
         |    MIN(CASE WHEN rn = FLOOR($p * (n - 1)) THEN v END) AS a$i,
         |    MIN(CASE WHEN rn = FLOOR($p * (n - 1)) + 1 THEN v END) AS b$i""".stripMargin
    }.mkString(",\n")
    val outCols = ps.zipWithIndex.map { case ((alias, _), i) =>
      s"""  CASE WHEN pos$i = lo$i OR a$i = b$i THEN a$i
         |       ELSE (lo$i + 1 - pos$i) * a$i + (pos$i - lo$i) * b$i END AS $alias""".stripMargin
    }.mkString(",\n")
    val groupBy = if (partCols.isEmpty) "" else s"\n  GROUP BY $part"
    s"""$name AS (
       |  SELECT $partSel
       |$outCols
       |  FROM (
       |  SELECT $partSel
       |$aggCols
       |  FROM (
       |    SELECT $partSel$valExpr AS v,
       |      ROW_NUMBER() OVER (${over}ORDER BY $valExpr) - 1 AS rn,
       |      COUNT(*) OVER (${over.trim}) AS n
       |    FROM $src
       |    WHERE $valExpr IS NOT NULL)$groupBy))""".stripMargin
  }
}
