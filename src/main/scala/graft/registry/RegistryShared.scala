package graft

/** Oracle-SQL CTE fragments shared by more than one domain registry. */
private[graft] trait RegistryShared {

  /** Shared CTE: 32-bit md5 SimHash per doc — mirrors
    * [[graft.operators.Dedup.simhashMd5]] (lowercased whitespace
    * tokens, h = first 8 hex chars of md5, per-bit votes, Σ 2^bit).
    */
  protected val simhashMd5Cte: String =
    """t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      |hh AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok),1,8)) AS BIGINT) AS h FROM t),
      |v AS (SELECT doc_id, b, sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS votes
      |      FROM hh CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bits GROUP BY 1, 2),
      |fp AS (SELECT doc_id,
      |              CAST(sum(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash32
      |       FROM v GROUP BY doc_id)""".stripMargin

}
