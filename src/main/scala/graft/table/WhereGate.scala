package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._

/** Expression-AST allowlist for `filterWhere` (ref `core/extract.py:49-101`).
  *
  * The reference gates its WHERE passthrough with a keyword blocklist; a
  * denylist over strings loses the arms race by construction (round-14's
  * fuzz had to patch two bypasses: a dot-no-newline regex, and Spark's
  * `reflect`/`java_method` escape hatches that call arbitrary static JVM
  * methods from inside an expression). This gate keeps the reference's
  * keyword refusal as a fast parity pre-check, then parses the WHERE with
  * Spark's own SQL parser and walks the unresolved tree, rejecting any
  * node outside an allowlist of structural classes (boolean/comparison/
  * arithmetic/conditional/cast) and any function call outside an
  * allowlist of scalar names (string/math/null/date functions plus the
  * session-registered `st_*` surface). Unknown future escape hatches are
  * rejected by default instead of requiring a new regex.
  *
  * Documented false-positive bound, inherited from the reference: a
  * keyword as a whole word ANYWHERE in the string — even inside a string
  * literal (`name = 'drop'`) — refuses conservatively. The split form
  * (`name = concat('dr','op')`) passes: an expression cannot escalate a
  * VALUE into a statement, and `concat` is an allowlisted function.
  */
object WhereGate {

  /** The reference's DDL/DML keyword set — statement shapes an expression
    * string could try to smuggle; refused on sight, pre-parse.
    */
  private val Keywords = Seq("drop", "delete", "insert", "update", "alter",
    "create", "attach", "copy", "pragma")

  /** Scalar functions a WHERE may call. Everything here is a pure
    * computation over its arguments — no I/O, no reflection, no session
    * state mutation. (Spark's `reflect`/`java_method`, file readers,
    * `assert_true`/`raise_error`, and higher-order functions are NOT
    * here, which is the point.)
    */
  private[graft] val AllowedFunctions: Set[String] = Set(
    // string
    "length", "char_length", "character_length", "lower", "upper", "lcase",
    "ucase", "trim", "ltrim", "rtrim", "btrim", "substring", "substr",
    "left", "right", "lpad", "rpad", "concat", "concat_ws", "replace",
    "translate", "reverse", "initcap", "instr", "locate", "position",
    "startswith", "endswith", "contains", "like", "ilike", "rlike",
    "regexp", "regexp_like", "regexp_extract", "regexp_replace",
    "split_part", "repeat", "ascii", "chr", "char", "elt", "soundex",
    "levenshtein",
    // math
    "abs", "round", "bround", "floor", "ceil", "ceiling", "sqrt", "cbrt",
    "exp", "expm1", "ln", "log", "log1p", "log2", "log10", "pow", "power",
    "mod", "pmod", "sign", "signum", "greatest", "least", "sin", "cos",
    "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh",
    "degrees", "radians", "pi", "e", "hypot", "factorial",
    // null handling / conditionals (Spark 4 parses BETWEEN as a
    // function call rather than an And of comparisons)
    "coalesce", "nullif", "ifnull", "nvl", "nvl2", "isnull", "isnotnull",
    "isnan", "nanvl", "if", "between",
    // date/time (deterministic projections of a value or of session time)
    "year", "quarter", "month", "day", "dayofmonth", "dayofweek",
    "weekday", "dayofyear", "weekofyear", "hour", "minute", "second",
    "to_date", "to_timestamp", "date", "timestamp", "date_add",
    "date_sub", "dateadd", "datediff", "date_diff", "add_months",
    "months_between", "last_day", "next_day", "trunc", "date_trunc",
    "unix_timestamp", "to_unix_timestamp", "from_unixtime",
    "unix_date", "unix_seconds", "make_date", "make_timestamp",
    "current_date", "current_timestamp", "now",
    // explicit casts-by-name
    "cast", "try_cast", "string", "int", "bigint", "smallint", "tinyint",
    "double", "float", "boolean", "decimal", "binary")

  /** Structural expression nodes a WHERE may contain. Function calls are
    * judged by name above; everything else must be one of these classes.
    */
  private def allowedNode(e: Expression): Boolean = e match {
    case _: Literal | _: UnresolvedAttribute => true
    case f: UnresolvedFunction =>
      val name = f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT))
      name.length == 1 && !f.isDistinct && f.filter.isEmpty &&
        (AllowedFunctions(name.head) || name.head.startsWith("st_"))
    case _: And | _: Or | _: Not => true
    case _: EqualTo | _: EqualNullSafe | _: LessThan | _: LessThanOrEqual |
         _: GreaterThan | _: GreaterThanOrEqual => true
    case _: In => true
    case _: Like | _: RLike | _: ILike => true
    case _: IsNull | _: IsNotNull | _: IsNaN => true
    case _: Add | _: Subtract | _: Multiply | _: Divide |
         _: IntegralDivide | _: Remainder | _: UnaryMinus |
         _: UnaryPositive => true
    case _: Cast => true
    case _: CaseWhen | _: If => true
    case _: Coalesce | _: Greatest | _: Least => true
    case _: Concat => true
    // bare keyword forms: Spark parses CURRENT_DATE / CURRENT_TIMESTAMP
    // without parens straight to these nodes rather than to an
    // UnresolvedFunction, so the (documented-allowed) function-name
    // allowlist alone would falsely refuse them
    case _: CurrentDate | _: CurrentTimestamp | _: Now => true
    case _ => false
  }

  /** Validate a WHERE string; throws IllegalArgumentException naming the
    * offending keyword/node, or Spark's ParseException if it does not
    * parse as an expression at all. Returns unit — the caller still
    * applies the string through `expr(where)` so filter semantics are
    * exactly Spark's.
    */
  def validate(spark: SparkSession, where: String): Unit = {
    val lower = where.toLowerCase(java.util.Locale.ROOT)
    Keywords.foreach { k =>
      require(!lower.matches(s"(?s).*\\b$k\\b.*"),
        s"disallowed keyword in WHERE: $where")
    }
    val parsed = spark.sessionState.sqlParser.parseExpression(where)
    parsed.foreach { node =>
      require(allowedNode(node),
        s"disallowed expression in WHERE: ${node.getClass.getSimpleName}" +
          (node match {
            case f: UnresolvedFunction => s" (${f.nameParts.mkString(".")})"
            case _ => ""
          }) + s" in: $where")
    }
  }
}
