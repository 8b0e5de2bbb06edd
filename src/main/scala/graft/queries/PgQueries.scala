package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.frontend.PgDialect

/** PG-dialect conformance corpus (round-13 agenda #1): the front-end was
  * validated on exactly two artifacts (the reference's shipped
  * `assets_per_type.sql` and a PG-written TPC-H Q6), and three precedence
  * bugs in round 12 were caught by review, not gates — the risk class is
  * SILENT MISTRANSLATION. Each gate here is a warehouse query WRITTEN IN
  * POSTGRES DIALECT, executed through [[graft.frontend.PgDialect]], and
  * hash-matched against a hand-written native oracle — so every
  * translation rule (E'…' strings, dollar-quoting, FILTER (WHERE …),
  * DISTINCT ON, ILIKE, `%` chains, `::` in every operand position, PG
  * implicit null ordering) carries value-exact evidence, not just a
  * translation-text unit test. The REJECTION side (constructs that must
  * raise rather than mistranslate) is PgDialectSpec's
  * "documented non-goals" case. */
object PgQueries {

  private def pg(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerAll(s, dir)
    PgDialect.run(s, sql)
  }

  /** Rule 7: E'…' escape strings (named + hex escapes) in expression
    * position — PG decodes them; the translator must re-encode the
    * decoded VALUE for Spark, not pass the escape text through. */
  private val estringSql = """
    select c_custkey, c_name || E'\t' || lower(c_mktsegment) || E'\x21' as tagged
    from customer order by c_custkey"""

  /** Rule 8: dollar-quoted literal carrying quotes AND a backslash —
    * the two characters whose mishandling corrupts a standard literal. */
  private val dollarSql = """
    select count(*)::int as n, $$it's a "weird" \ literal$$ as lit
    from customer"""

  /** FILTER (WHERE …) aggregate suffixes pass through untranslated (the
    * semantics match Spark's); the operand scanners must treat the whole
    * suffixed aggregate as one primary. `::` appears inside the
    * aggregate argument and around the suffixed aggregate. */
  private val filterAggSql = """
    select user_id,
      count(*) filter (where event_type = 'click') as clicks,
      (sum(value::numeric(18,6)) filter (where event_type = 'view'))::float8 as view_sum
    from events group by user_id order by user_id"""

  /** Rule 9: DISTINCT ON — latest event per user via PG's idiom; the
    * translator synthesizes the row_number window Spark needs. */
  private val distinctOnSql = """
    select distinct on (user_id) user_id, event_id, value
    from events order by user_id, event_id desc"""

  /** ILIKE passes through (Spark 3.3+ has PG's case-insensitive LIKE). */
  private val ilikeSql = """
    select c_custkey, c_name from customer
    where c_name ilike '%customer#0000001%' and c_mktsegment ilike 'bui%'
    order by c_custkey"""

  /** Precedence gauntlet: `%` inside multiplicative chains, truncating
    * integer `/`, unary minus above `^`, `^` left-associativity — the
    * round-12 review corners, now value-gated. */
  private val modPowChainSql = """
    select event_id,
      event_id % 7 * 3 / 4 as a,
      -2 ^ 2 + event_id % 5 as b,
      event_id / 10 % 3 as c,
      2 ^ 2 ^ 3 as d
    from events where event_id < 100 order by event_id"""

  /** `::` in every operand position: chained, parenthesized, on a bare
    * literal inside a `%` chain, and on a CASE…END primary. */
  private val castPositionsSql = """
    select o_orderkey::int::bigint as k,
      (o_totalprice::numeric(12,2))::float8 as p,
      o_custkey % 5::bigint as m,
      case when o_orderdate >= '1997-01-01'::timestamp then 1 else 0 end::smallint as recent
    from orders order by o_orderkey"""

  /** Rule 10: PG implicit null ordering (ASC→NULLS LAST, DESC→NULLS
    * FIRST — the mirror of Spark's defaults). The ROW_NUMBER makes null
    * placement VALUE-visible: the driver's compare sorts rows before
    * hashing, so a bare ORDER BY difference would be invisible, but a
    * rank assigned under the wrong null order changes cell values. */
  private val nullsOrderSql = """
    select user_id, v, row_number() over (order by v desc, user_id) as rk
    from (select user_id,
            max(value) filter (where event_type = 'signup' and value > 100.0) as v
          from events group by user_id) t
    order by user_id"""

  /** TPC-H Q3 written in PG dialect end-to-end (casts, implicit-null
    * ordering on the DESC sort, LIMIT) — must hash-match the same oracle
    * as the native form's semantics. */
  private val tpchQ3Sql = """
    select l_orderkey,
      (sum((l_extendedprice * (1 - l_discount))::numeric(22,6)))::float8 as revenue,
      o_orderpriority
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < '1998-03-15 00:00:00'::timestamp
      and l_shipdate > '1998-03-15 00:00:00'::timestamp
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey limit 10"""

  /** Uncorrelated FROM-position set-returning function with the PG
    * function-alias-names-the-column idiom, plus `%` on its output and
    * `::` inside its arguments. */
  private val seriesWhereSql = """
    select d.d, d.d % 3 as m
    from generate_series(1::bigint, 50::bigint) d
    where d.d % 2 = 1 order by d.d"""

  /** Rule 12a: the PG regex operator family — `~` (partial match), `~*`
    * (case-insensitive), `!~*` (negated) — translated to regexp_like
    * forms; day-one constructs for a migrating PG user (r13 Next #3).
    * The CASE makes match results VALUE-visible per row. */
  private val regexSql = """
    select p_partkey,
      case when p_name ~ '^(blue|red) ' then 1 else 0 end as starts_color,
      case when p_name ~* 'WIDGET$' then 1 else 0 end as ci_widget,
      case when p_name !~* 'BO(LT|X)' then 1 else 0 end as no_bolt
    from part
    where p_name ~ '(rod|bolt|widget)'
    order by p_partkey"""

  /** Rule 12b: SIMILAR TO's SQL-pattern dialect (%, _, alternation,
    * bracket class) translated to an anchored regex; includes NOT
    * SIMILAR TO and a literal-dot escape. */
  private val similarToSql = """
    select c_custkey, c_mktsegment
    from customer
    where c_mktsegment similar to '%(MACH|BUILD)%'
      and c_mktsegment not similar to 'AUTO%'
      and c_name similar to 'Customer#[0-9]+'
    order by c_custkey"""

  /** Round-15 agenda #7: POSIX bracket classes inside `~`-family and
    * SIMILAR TO patterns translate to the exact Java `\p{…}` classes
    * instead of rejecting — `[[:digit:]]`, `[[:upper:]]`, a
    * case-insensitive `~*` over a class, and a SIMILAR TO class, all
    * value-visible per row. */
  private val regexClassesSql = """
    select c_custkey,
      case when c_name ~ 'Customer#[[:digit:]]+' then 1 else 0 end as name_shape,
      case when c_mktsegment ~ '^[[:upper:]]+$' then 1 else 0 end as seg_upper,
      case when c_mktsegment ~* '^bui[[:alpha:]]+$' then 1 else 0 end as ci_bui,
      case when c_name similar to 'Customer#[[:digit:]]+' then 1 else 0 end
        as sim_shape
    from customer
    where c_name ~ '[[:digit:]]{3}'
    order by c_custkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pg_estring" -> ((s, d) => pg(s, d, estringSql)),
    "pg_dollar_quote" -> ((s, d) => pg(s, d, dollarSql)),
    "pg_filter_agg" -> ((s, d) => pg(s, d, filterAggSql)),
    "pg_distinct_on" -> ((s, d) => pg(s, d, distinctOnSql)),
    "pg_ilike" -> ((s, d) => pg(s, d, ilikeSql)),
    "pg_mod_pow_chain" -> ((s, d) => pg(s, d, modPowChainSql)),
    "pg_cast_positions" -> ((s, d) => pg(s, d, castPositionsSql)),
    "pg_nulls_order" -> ((s, d) => pg(s, d, nullsOrderSql)),
    "pg_tpch_q3" -> ((s, d) => pg(s, d, tpchQ3Sql)),
    "pg_series_where" -> ((s, d) => pg(s, d, seriesWhereSql)),
    "pg_regex" -> ((s, d) => pg(s, d, regexSql)),
    "pg_similar_to" -> ((s, d) => pg(s, d, similarToSql)),
    "pg_regex_classes" -> ((s, d) => pg(s, d, regexClassesSql)))

  val oracle: Map[String, String] = Map(
    "pg_estring" -> """
      SELECT c_custkey, c_name || chr(9) || lower(c_mktsegment) || chr(33) AS tagged
      FROM customer ORDER BY c_custkey""",
    "pg_dollar_quote" -> """
      SELECT CAST(COUNT(*) AS INT) AS n, 'it''s a "weird" \ literal' AS lit
      FROM customer""",
    "pg_filter_agg" -> """
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'view')
          AS DOUBLE) AS view_sum
      FROM events GROUP BY user_id ORDER BY user_id""",
    "pg_distinct_on" -> """
      SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1 ORDER BY user_id""",
    "pg_ilike" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE c_name ILIKE '%customer#0000001%' AND c_mktsegment ILIKE 'bui%'
      ORDER BY c_custkey""",
    "pg_mod_pow_chain" -> """
      SELECT event_id,
        CAST((event_id % 7 * 3) // 4 AS BIGINT) AS a,
        CAST(POWER(-2, 2) + event_id % 5 AS DOUBLE) AS b,
        CAST((event_id // 10) % 3 AS BIGINT) AS c,
        CAST(POWER(POWER(2, 2), 3) AS DOUBLE) AS d
      FROM events WHERE event_id < 100 ORDER BY event_id""",
    "pg_cast_positions" -> """
      SELECT CAST(CAST(o_orderkey AS INT) AS BIGINT) AS k,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS p,
        o_custkey % CAST(5 AS BIGINT) AS m,
        CAST(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END
          AS SMALLINT) AS recent
      FROM orders ORDER BY o_orderkey""",
    "pg_nulls_order" -> """
      SELECT user_id, v,
        ROW_NUMBER() OVER (ORDER BY v DESC NULLS FIRST, user_id) AS rk
      FROM (SELECT user_id,
              MAX(value) FILTER (WHERE event_type = 'signup' AND value > 100.0) AS v
            FROM events GROUP BY user_id) t
      ORDER BY user_id""",
    "pg_tpch_q3" -> """
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
          AS DOUBLE) AS revenue,
        o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "pg_series_where" -> """
      SELECT generate_series AS d, generate_series % 3 AS m
      FROM generate_series(1, 50)
      WHERE generate_series % 2 = 1 ORDER BY 1""",
    "pg_regex" -> """
      SELECT p_partkey,
        CASE WHEN regexp_matches(p_name, '^(blue|red) ') THEN 1 ELSE 0 END
          AS starts_color,
        CASE WHEN regexp_matches(p_name, 'WIDGET$', 'i') THEN 1 ELSE 0 END
          AS ci_widget,
        CASE WHEN NOT regexp_matches(p_name, 'BO(LT|X)', 'i') THEN 1 ELSE 0 END
          AS no_bolt
      FROM part
      WHERE regexp_matches(p_name, '(rod|bolt|widget)')
      ORDER BY p_partkey""",
    "pg_similar_to" -> """
      SELECT c_custkey, c_mktsegment
      FROM customer
      WHERE regexp_full_match(c_mktsegment, '.*(MACH|BUILD).*')
        AND NOT regexp_full_match(c_mktsegment, 'AUTO.*')
        AND regexp_full_match(c_name, 'Customer#[0-9]+')
      ORDER BY c_custkey""",
    "pg_regex_classes" -> """
      SELECT c_custkey,
        CASE WHEN regexp_matches(c_name, 'Customer#[[:digit:]]+')
          THEN 1 ELSE 0 END AS name_shape,
        CASE WHEN regexp_matches(c_mktsegment, '^[[:upper:]]+$')
          THEN 1 ELSE 0 END AS seg_upper,
        CASE WHEN regexp_matches(c_mktsegment, '^bui[[:alpha:]]+$', 'i')
          THEN 1 ELSE 0 END AS ci_bui,
        CASE WHEN regexp_full_match(c_name, 'Customer#[[:digit:]]+')
          THEN 1 ELSE 0 END AS sim_shape
      FROM customer
      WHERE regexp_matches(c_name, '[[:digit:]]{3}')
      ORDER BY c_custkey""")
}
