package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph-side operators over a materialized triple table: the KG this
  * engine CONSTRUCTS (detect→expand→toRDF→c14n) is also a KG users QUERY.
  * Three families, all declarative DataFrame plans so Catalyst keeps
  * pushdown/pruning/broadcast decisions:
  *
  *  - '''Direct Mapping''' (relational→RDF per the W3C "A Direct Mapping
  *    of Relational Data to RDF" recommendation): turns any DataFrame into
  *    (subj, pred, obj, dt) triples — row node from the primary key, one
  *    literal triple per column, one reference triple per foreign key.
  *    The triple explosion is a single narrow `explode` over a literal
  *    struct array: one scan, no shuffle, fully codegen'd. At 100 TB this
  *    is the bulk-ingest path from warehouse tables into the KG.
  *
  *  - '''Basic graph patterns''' (the SPARQL BGP core): a pattern list
  *    compiles to filtered projections of the triple table joined on
  *    shared variables. Constant terms become pushable predicates (they
  *    reach the parquet scan of a predicate-bucketed triple table), and
  *    join sizing is left to Catalyst/AQE — selective patterns broadcast,
  *    large ones shuffle on the shared variable.
  *
  *  - '''Graph statistics''': predicate histogram and per-node
  *    in/out-degrees — single hash aggregations (map-side partials), the
  *    standard profile queries over a freshly built KG.
  *
  * Reference scope note: json-gold stops at algorithm outputs (expand /
  * toRDF / frame — e.g. `/root/reference/ld/api.go`); querying the
  * resulting graph is corpus-level capability this engine adds on top.
  */
object GraphOps {

  /** A term in a triple pattern: either a variable (joins/projections
    * bind it) or a constant (compiles to a pushable equality filter).
    */
  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Const(value: String) extends Term
  /** Predicate alternation `<a>|<b>`: matches any of the constants —
    * compiles to a pushable IN filter, no union of branches needed.
    */
  final case class ConstIn(values: Seq[String]) extends Term
  /** SPARQL negated property set `!<p>` / `!(<a>|<b>)`: matches any
    * predicate EXCEPT the listed constants — a pushable NOT-IN filter.
    * The predicate is not bound (per the spec, a negated set never
    * introduces a variable).
    */
  final case class ConstNotIn(values: Seq[String]) extends Term

  val RdfTypeIri = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  final case class TriplePattern(s: Term, p: Term, o: Term)

  val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  val XsdBoolean = "http://www.w3.org/2001/XMLSchema#boolean"
  val XsdDate = "http://www.w3.org/2001/XMLSchema#date"
  val XsdDateTime = "http://www.w3.org/2001/XMLSchema#dateTime"

  /** XSD datatype IRI for a Spark column type (Direct Mapping §Datatype
    * Mappings). Doubles map to xsd:double but their LEXICAL form here is
    * Spark's `cast(string)` (Java Double.toString) — callers needing
    * canonical XSD doubles should pre-format; integer/string/boolean/date
    * lexical forms are already canonical.
    */
  def xsdOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => XsdInteger
    case FloatType | DoubleType => XsdDouble
    case _: DecimalType => XsdDecimal
    case BooleanType => XsdBoolean
    case DateType => XsdDate
    case TimestampType => XsdDateTime
    case _ => XsdString
  }

  /** Row-node IRI for `table` keyed by `pk` — `urn:dm:<table>/<pk>`. */
  def rowIri(tableName: String, pk: Column): Column =
    concat(lit(s"urn:dm:$tableName/"), pk.cast("string"))

  /** W3C-style Direct Mapping of a DataFrame to triples.
    *
    * Emits, per row with primary key `pk`:
    *  - a literal triple `<urn:dm:T/pk> <urn:dm:T#col> "value"^^xsd:…`
    *    for every non-pk column (nulls skipped, as the spec mandates);
    *  - additionally, for every column in `refs` (column → referenced
    *    table), a reference triple
    *    `<urn:dm:T/pk> <urn:dm:T#ref-col> <urn:dm:R/fk>` with dt "" —
    *    the IRI-object convention this engine's pipeline quads use.
    *
    * Plan shape: one scan → `explode` of a per-row literal struct array →
    * null filter. No shuffle, whole-stage codegen; at 10^12 rows this
    * scales with the scan.
    */
  def directMapping(table: DataFrame, tableName: String, pk: String,
                    refs: Map[String, String] = Map.empty): DataFrame = {
    val entries: Seq[Column] = table.schema.fields.filter(_.name != pk).toSeq.flatMap { f =>
      val literal = struct(
        lit(s"urn:dm:$tableName#${f.name}").as("pred"),
        col(f.name).cast("string").as("obj"),
        lit(xsdOf(f.dataType)).as("dt"))
      refs.get(f.name) match {
        case Some(refTable) => Seq(literal, struct(
          lit(s"urn:dm:$tableName#ref-${f.name}").as("pred"),
          rowIri(refTable, col(f.name)).as("obj"),
          lit("").as("dt")))
        case None => Seq(literal)
      }
    }
    explodeTriples(table, tableName, pk, entries)
  }

  /** Only the foreign-key reference triples of a table — the edge-only
    * projection of [[directMapping]] for fact tables whose literal columns
    * (measures) don't belong in the graph.
    */
  def referenceTriples(table: DataFrame, tableName: String, pk: String,
                       refs: Map[String, String]): DataFrame = {
    val entries = refs.toSeq.sortBy(_._1).map { case (fkCol, refTable) =>
      struct(
        lit(s"urn:dm:$tableName#ref-$fkCol").as("pred"),
        rowIri(refTable, col(fkCol)).as("obj"),
        lit("").as("dt"))
    }
    explodeTriples(table, tableName, pk, entries)
  }

  /** Shared tail of the mapping operators: row IRI + one `explode` over
    * the per-row (pred, obj, dt) entries + the spec's null skip.
    */
  private def explodeTriples(table: DataFrame, tableName: String, pk: String,
                             entries: Seq[Column]): DataFrame =
    table.select(rowIri(tableName, col(pk)).as("subj"), explode(array(entries: _*)).as("po"))
      .select(col("subj"), col("po.pred").as("pred"), col("po.obj").as("obj"),
        col("po.dt").as("dt"))
      .filter(col("obj").isNotNull)

  /** Compile a basic graph pattern to a join plan over a (subj, pred, obj[,
    * dt]) triple table. Each pattern becomes a filtered projection (constant
    * terms → equality predicates, pushable to the scan; repeated variables
    * within a pattern → self-equality filters); patterns then fold into
    * inner joins on their shared variables, left to right — order patterns
    * selective-first, exactly as a SPARQL engine's join-order heuristic
    * would. Catalyst/AQE picks broadcast vs shuffle per join from actual
    * sizes. Output: one column per distinct variable.
    *
    * Patterns with no shared variable with the accumulated prefix form a
    * cartesian product (valid SPARQL, rarely intended) — allowed, but the
    * caller sees it in the plan.
    */
  def bgp(quads: DataFrame, patterns: Seq[TriplePattern],
          trackDt: Boolean = false): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    compilePatterns(quads,
      patterns.map(p => Seq("subj" -> p.s, "pred" -> p.p, "obj" -> p.o)), trackDt)
  }

  /** Companion-column suffix for tracked datatypes: an object-position
    * variable `?v` compiled with `trackDt` carries `v__dt` alongside —
    * the term-introspection filters (DATATYPE / isIRI / isLiteral /
    * isBlank / isNumeric) read it. [[compileBody]] drops these from
    * query output.
    */
  private val DtSuffix = "__dt"

  /** Shared pattern→join compiler behind [[bgp]] and [[bgpQuads]]: each
    * pattern is a (column, term) list — constants become equality filters,
    * repeated variables become self-equality filters, variables project —
    * and patterns fold into joins on shared variable names. With
    * `trackDt`, object-position variables also project their quad's `dt`
    * column as `v__dt` (two patterns binding the same object variable
    * join on it too — same term, same datatype, so the extra key never
    * changes the solution set).
    */
  private def compilePatterns(quads: DataFrame,
                              patterns: Seq[Seq[(String, Term)]],
                              trackDt: Boolean = false): DataFrame = {
    def one(terms: Seq[(String, Term)]): DataFrame = {
      val constFilter = terms.collect {
        case (c, Const(v)) => col(c) === lit(v)
        case (c, ConstIn(vs)) => col(c).isin(vs: _*)
        case (c, ConstNotIn(vs)) => !col(c).isin(vs: _*)
      }.reduceOption(_ && _).getOrElse(lit(true))
      val vars = terms.collect { case (c, Var(n)) => (c, n) }
      val eqFilter = vars.groupBy(_._2).values.collect {
        case group if group.size > 1 =>
          group.map(g => col(g._1)).sliding(2).collect { case Seq(a, b) => a === b }
            .reduce(_ && _)
      }.reduceOption(_ && _).getOrElse(lit(true))
      val proj = vars.groupBy(_._2).toSeq.sortBy(_._1)
        .flatMap { case (n, group) =>
          col(group.head._1).as(n) +:
            (if (trackDt && group.exists(_._1 == "obj"))
              Seq(col("dt").as(n + DtSuffix))
            else Seq.empty)
        }
      val base = quads.filter(constFilter && eqFilter)
      if (proj.isEmpty) base.select(lit(1).as("__matched")).limit(1)
      else base.select(proj: _*)
    }
    patterns.map(one).reduce { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq.sorted
      if (shared.isEmpty) acc.crossJoin(next) else acc.join(next, shared)
    }
  }

  /** Parse a terse SPARQL-style basic-graph-pattern block into
    * [[TriplePattern]]s. Patterns are separated by whitespace-surrounded
    * dots (`?a <p> ?b . ?b <q> "x"`); terms are `?var`, `<iri>`, or a
    * double-quoted literal (spaces — and standalone dots — allowed inside
    * quotes: the block is TOKENIZED first, then split on `.` tokens, so a
    * literal like `"one . two"` never splits a pattern).
    *
    * Predicate position additionally accepts SPARQL property-path terse
    * forms: `<p>+` / `<p>*` (compiled against the virtual closure
    * triples of [[withPathClosure]]/[[withPathStarClosure]] — [[select]]
    * bridges them automatically) and sequences `<a>/<b>` (each segment
    * optionally `+`/`*`-suffixed), which expand to a chain of patterns
    * through fresh internal variables (dropped from [[select]] output).
    * Deliberately tiny — the compile target is
    * [[bgp]]/[[bgpOptional]]/[[construct]], not a full SPARQL grammar.
    */
  def parsePatterns(block: String): Seq[TriplePattern] = {
    val termRe = """"[^"]*"|\S+""".r
    val toks = termRe.findAllIn(block).toSeq
    // split the token stream on standalone "." separators (a quoted " . "
    // is already one literal token and can't match here)
    val groups = toks.foldLeft(List(List.empty[String])) { (acc, t) =>
      if (t == ".") List.empty[String] :: acc else (t :: acc.head) :: acc.tail
    }.map(_.reverse).reverse.filter(_.nonEmpty)
    groups.flatMap { p =>
      require(p.length == 3, s"pattern needs exactly 3 terms: '${p.mkString(" ")}'")
      expandPredicate(parseTerm(p(0)), p(1), parseTerm(p(2)))
    }
  }

  /** Internal-variable namespace for path-sequence expansion; [[select]]
    * drops these columns from its output. Globally unique (atomic
    * counter): two sequence patterns in DIFFERENT sub-blocks of one
    * query must never join on an accidentally shared internal name.
    */
  private val SeqVarPrefix = "__seq"
  private val seqCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Expand one parsed (subject, predicate-token, object) into pattern(s):
    * a sequence token `<a>/<b>+/<c>` becomes a chain through fresh
    * internal variables; a `^`-prefixed segment (inverse path) swaps that
    * hop's subject and object; an alternation segment `<a>|<b>` compiles
    * to a [[ConstIn]] predicate (pushable IN filter). The sequence split
    * fires only on `/` BETWEEN IRI tokens (after `>`/`>+`/`>*`/`>?`,
    * before `<` or `^<`) — a `/` inside an IRI like `<urn:dm:nation/1>`
    * never splits.
    */
  private def expandPredicate(s: Term, predToken0: String, o: Term): Seq[TriplePattern] = {
    // SPARQL's `a` keyword — rdf:type, predicate position only
    val predToken = if (predToken0 == "a") "<" + RdfTypeIri + ">" else predToken0
    val segs = predToken.split("(?<=>[+*?]?)/(?=\\^?<)").toSeq
    def hop(sub: Term, seg: String, obj: Term): TriplePattern =
      if (seg.startsWith("^")) TriplePattern(obj, parsePathSegment(seg.drop(1)), sub)
      else TriplePattern(sub, parsePathSegment(seg), obj)
    if (segs.length == 1) Seq(hop(s, predToken, o))
    else {
      val hops = segs.indices.map(i =>
        if (i == segs.length - 1) o
        else Var(SeqVarPrefix + seqCounter.getAndIncrement()))
      segs.zipWithIndex.map { case (seg, i) =>
        hop(if (i == 0) s else hops(i - 1), seg, hops(i))
      }
    }
  }

  /** One path segment (after any `^` strip): `<iri>` / `?var` / quoted
    * literal, the closure forms `<iri>+` / `<iri>*` / `<iri>?` (virtual
    * closure predicates — the naming contract of [[withPathClosure]] /
    * [[withPathStarClosure]] / [[withPathOptClosure]]), or an
    * alternation `<a>|<b>` of PLAIN IRIs (closure suffixes inside an
    * alternation are rejected, not guessed).
    */
  private def parsePathSegment(t: String): Term = {
    // negated property set: `!<p>` or `!(<a>|<b>)` — plain IRIs only
    if (t.startsWith("!")) {
      var inner = t.drop(1)
      if (inner.startsWith("(") && inner.endsWith(")")) inner = inner.drop(1).dropRight(1)
      val values = inner.split("\\|").toSeq.map { a =>
        parseTerm(a) match {
          case Const(v) => v
          case other => throw new IllegalArgumentException(
            s"a negated property set needs plain IRIs, got '$a' in '$t'")
        }
      }
      return ConstNotIn(values)
    }
    // the lookbehind admits closure suffixes so '<a>+|<b>' SPLITS and the
    // '<a>+' alternative is then loudly rejected below (without the wider
    // lookbehind the whole token silently parsed as one bizarre IRI)
    val alts = t.split("(?<=>[+*?]?)\\|(?=\\^?<)").toSeq
    if (alts.length > 1) {
      val values = alts.map { a =>
        parseTerm(a) match {
          case Const(v) => v
          case _ => throw new IllegalArgumentException(
            s"alternation segments must be plain IRIs, got '$a' in '$t'")
        }
      }
      ConstIn(values)
    } else if (t.length > 3 && t.startsWith("<") &&
        (t.endsWith(">+") || t.endsWith(">*") || t.endsWith(">?")))
      Const(t.substring(1, t.length - 2) + t.last)
    else parseTerm(t)
  }

  /** One term: `?var`, `<iri>`, or a double-quoted literal. */
  def parseTerm(t: String): Term =
    if (t.startsWith("?") && t.length > 1) Var(t.drop(1))
    else if (t.startsWith("<") && t.endsWith(">") && t.length > 2)
      Const(t.drop(1).dropRight(1))
    else if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2)
      Const(t.drop(1).dropRight(1))
    else throw new IllegalArgumentException(s"unrecognized term '$t'")

  /** A parsed FILTER constraint — one `Column` predicate over the
    * solution bindings.
    */
  sealed trait Constraint { def column: Column }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "=" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
    case other => throw new IllegalArgumentException(s"unsupported FILTER op '$other'")
  }

  /** A value-level expression inside FILTER / BIND: variables, literals,
    * string functions, arithmetic. `stringTyped` drives comparison
    * semantics — a comparison with a string-typed side compares
    * lexically, anything else casts both sides to double (so literal
    * "42" matches 42.0, SPARQL's numeric-value semantics over this
    * engine's lexical-form storage).
    */
  sealed trait ValueExpr { def column: Column; def stringTyped: Boolean = false }
  final case class VEVar(name: String) extends ValueExpr { def column: Column = col(name) }
  final case class VENum(v: Double) extends ValueExpr { def column: Column = lit(v) }
  final case class VEStr(s: String) extends ValueExpr {
    def column: Column = lit(s); override def stringTyped = true
  }
  /** `STRLEN(e)` — numeric. */
  final case class VEStrLen(e: ValueExpr) extends ValueExpr {
    def column: Column = length(e.column.cast("string")).cast("double")
  }
  /** `STR(e)` — the lexical form (SPARQL's node-to-string cast). */
  final case class VEStrCast(e: ValueExpr) extends ValueExpr {
    def column: Column = e.column.cast("string"); override def stringTyped = true
  }
  /** `CONCAT(e, …)` — string concatenation (null-propagating, as SPARQL
    * CONCAT errors on unbound arguments and the error eliminates the row).
    */
  final case class VEConcat(args: Seq[ValueExpr]) extends ValueExpr {
    def column: Column = concat(args.map(_.column.cast("string")): _*)
    override def stringTyped = true
  }
  /** Numeric arithmetic `+ - * /` over double-cast operands; a
    * non-numeric lexical form casts to null and the row drops
    * (error-eliminates-row).
    */
  final case class VEArith(op: Char, l: ValueExpr, r: ValueExpr) extends ValueExpr {
    def column: Column = {
      val (a, b) = (l.column.cast("double"), r.column.cast("double"))
      op match {
        case '+' => a + b
        case '-' => a - b
        case '*' => a * b
        case '/' => a / b
      }
    }
  }
  final case class VENeg(e: ValueExpr) extends ValueExpr {
    def column: Column = -e.column.cast("double")
  }
  /** `IRI(e)` / `URI(e)` — IRI construction from a lexical form, THE
    * KG-construction primitive for minting node identities
    * (`BIND(IRI(CONCAT("urn:me:", ?key)) AS ?node)` then use `?node` in
    * a CONSTRUCT template). In this engine's storage model an IRI is its
    * lexical form with `dt = ""`, so the column is the string itself;
    * string-typed so comparisons against it stay lexical. Relative-IRI
    * resolution against a base is out of scope (pass absolute forms).
    */
  final case class VEIri(e: ValueExpr) extends ValueExpr {
    def column: Column = e.column.cast("string")
    override def stringTyped = true
  }
  /** SPARQL hash functions `MD5` / `SHA256` — lowercase hex digest of
    * the lexical form (string-typed, usable in BIND/SELECT heads and
    * comparisons; both engines agree byte-for-byte, so hash-derived
    * columns stay value-gateable).
    */
  final case class VEHash(func: String, e: ValueExpr) extends ValueExpr {
    def column: Column = func match {
      case "MD5" => md5(e.column.cast("string"))
      case "SHA256" => sha2(e.column.cast("string"), 256)
    }
    override def stringTyped = true
  }
  /** SPARQL numeric functions `ABS` / `ROUND` / `CEIL` / `FLOOR` over a
    * double-cast operand (non-numeric → null → error-eliminates-row,
    * like [[VEArith]]). ROUND follows SPARQL's round-half-up (toward
    * +∞), not banker's rounding — `floor(x + 0.5)` exactly.
    */
  final case class VENumFn(func: String, e: ValueExpr) extends ValueExpr {
    def column: Column = {
      val a = e.column.cast("double")
      func match {
        case "ABS" => abs(a)
        case "ROUND" => floor(a + lit(0.5)).cast("double")
        case "CEIL" => ceil(a).cast("double")
        case "FLOOR" => floor(a).cast("double")
      }
    }
  }
  /** SPARQL dateTime accessors `YEAR` / `MONTH` / `DAY` / `HOURS` /
    * `MINUTES` / `SECONDS` / `TZ` over an xsd:dateTime LEXICAL form
    * (`YYYY-MM-DDThh:mm:ss[.fff][Z|±hh:mm]` — the canonical lexical is
    * positional through the minutes, so fixed-offset substrings are
    * exact and engine-portable; SECONDS and TZ need the variable tail
    * and use an anchored regex). Numeric accessors are double-typed
    * like the rest of this grammar; a malformed lexical yields null
    * (error-eliminates-row). TZ returns `"Z"`, `"±hh:mm"`, or `""` when
    * the literal carries no timezone, per fn:timezone-from-dateTime's
    * SPARQL rendering.
    */
  final case class VEDateFn(func: String, e: ValueExpr) extends ValueExpr {
    def column: Column = {
      val s = e.column.cast("string")
      func match {
        case "YEAR" => substring(s, 1, 4).cast("double")
        case "MONTH" => substring(s, 6, 2).cast("double")
        case "DAY" => substring(s, 9, 2).cast("double")
        case "HOURS" => substring(s, 12, 2).cast("double")
        case "MINUTES" => substring(s, 15, 2).cast("double")
        case "SECONDS" =>
          regexp_extract(s, ":(\\d{2}(?:\\.\\d+)?)(?:Z|[+-]\\d{2}:\\d{2})?$", 1)
            .cast("double")
        case "TZ" => regexp_extract(s, "(Z|[+-]\\d{2}:\\d{2})$", 1)
      }
    }
    override def stringTyped: Boolean = func == "TZ"
  }
  /** SPARQL `ENCODE_FOR_URI` — percent-encode everything outside RFC
    * 3986's unreserved set (ALPHA / DIGIT / `-` / `.` / `_` / `~`),
    * UTF-8 bytes uppercase-hex. Implemented as the codegen'd
    * `url_encode` (application/x-www-form-urlencoded) with its three
    * deltas patched: space `+`→`%20`, `~` restored (unreserved), `*`
    * encoded (`%2A` — reserved in 3986, bare in form-encoding).
    */
  final case class VEEncodeUri(e: ValueExpr) extends ValueExpr {
    def column: Column = {
      val enc = url_encode(e.column.cast("string"))
      val sp = regexp_replace(enc, "\\+", "%20")
      val tilde = regexp_replace(sp, "%7E", "~")
      regexp_replace(tilde, "\\*", "%2A")
    }
    override def stringTyped = true
  }
  /** SPARQL `STRDT(lexical, <datatype>)` / `STRLANG(lexical, "tag")` —
    * construct a typed / language-tagged literal. The value is the
    * lexical form; the constructed datatype (or `@tag`, this engine's
    * language-tag channel) rides the variable's `__dt` companion when
    * the expression is BIND-bound, so `DATATYPE` / `LANG` / `LANGMATCHES`
    * introspect it like any pattern-bound term.
    */
  final case class VEStrDt(e: ValueExpr, dt: String) extends ValueExpr {
    def column: Column = e.column.cast("string")
    override def stringTyped = true
  }
  final case class VEStrLang(e: ValueExpr, tag: String) extends ValueExpr {
    def column: Column = e.column.cast("string")
    override def stringTyped = true
  }

  /** Boolean composition of constraints — Spark's three-valued AND/OR
    * matches SPARQL's: an errored (null) operand drops the row unless the
    * other side decides (`null OR true` keeps it, exactly SPARQL §17.2).
    */
  final case class AndC(l: Constraint, r: Constraint) extends Constraint {
    def column: Column = l.column && r.column
  }
  final case class OrC(l: Constraint, r: Constraint) extends Constraint {
    def column: Column = l.column || r.column
  }
  final case class NotC(c: Constraint) extends Constraint {
    def column: Column = !c.column
  }
  /** `BOUND(?v)` — true when the (OPTIONAL-introduced) variable is bound. */
  final case class BoundC(variable: String) extends Constraint {
    def column: Column = col(variable).isNotNull
  }
  /** String tests `REGEX` (find semantics, optional `"i"` flag) /
    * `STRSTARTS` / `STRENDS` / `CONTAINS` over arbitrary value
    * expressions.
    */
  final case class StrTest(func: String, target: ValueExpr, arg: ValueExpr,
                           ignoreCase: Boolean = false) extends Constraint {
    def column: Column = {
      val t = target.column.cast("string")
      val a = arg.column.cast("string")
      func match {
        case "REGEX" =>
          regexp_like(t, if (ignoreCase) concat(lit("(?i)"), a) else a)
        case "STRSTARTS" => startswith(t, a)
        case "STRENDS" => endswith(t, a)
        case "CONTAINS" => contains(t, a)
      }
    }
  }
  /** `SAMETERM(a, b)` — RDF term identity, which on this engine's
    * lexical-form storage is STRING equality of the two sides (no
    * numeric coercion: `sameTerm("01", "1")` is false where `?x = 1`
    * numeric-compares true — exactly SPARQL's sameTerm-vs-`=`
    * distinction for plain literals).
    */
  final case class SameTermC(l: ValueExpr, r: ValueExpr) extends Constraint {
    def column: Column = l.column.cast("string") === r.column.cast("string")
  }
  /** `UCASE` / `LCASE` — case mapping over the lexical form. */
  final case class VECase(func: String, e: ValueExpr) extends ValueExpr {
    def column: Column = {
      val t = e.column.cast("string")
      if (func == "UCASE") upper(t) else lower(t)
    }
    override def stringTyped = true
  }
  /** `SUBSTR(e, start[, len])` — 1-based, like SPARQL (and SQL). The
    * 2-arg form runs to the end of the string.
    */
  final case class VESubstr(e: ValueExpr, start: ValueExpr,
                            len: Option[ValueExpr]) extends ValueExpr {
    def column: Column = {
      val t = e.column.cast("string")
      val s = start.column.cast("int")
      t.substr(s, len.map(_.column.cast("int")).getOrElse(length(t)))
    }
    override def stringTyped = true
  }
  /** `REPLACE(e, pattern, replacement)` — regex replace of ALL matches
    * (SPARQL's fn:replace semantics; Spark's regexp_replace is global).
    */
  final case class VEReplace(e: ValueExpr, pat: ValueExpr,
                             rep: ValueExpr) extends ValueExpr {
    def column: Column = regexp_replace(e.column.cast("string"),
      pat.column.cast("string"), rep.column.cast("string"))
    override def stringTyped = true
  }
  /** `STRBEFORE` / `STRAFTER` with a LITERAL delimiter (the common
    * form): the part before/after the FIRST occurrence, `""` when the
    * delimiter does not occur — exactly SPARQL's empty-string-on-no-
    * match rule.
    */
  final case class VEStrSplit(func: String, e: ValueExpr,
                              delim: String) extends ValueExpr {
    def column: Column = {
      val t = e.column.cast("string")
      val pos = instr(t, delim)
      if (func == "STRBEFORE") when(pos > 0, t.substr(lit(1), pos - 1)).otherwise(lit(""))
      else when(pos > 0, t.substr(pos + delim.length, length(t))).otherwise(lit(""))
    }
    override def stringTyped = true
  }

  /** Align branch types for IF/COALESCE: any string-typed member casts
    * everything to string; otherwise columns pass through (variables are
    * lexical strings already, numerics are doubles — Spark coerces).
    */
  private def alignTypes(args: Seq[ValueExpr]): Seq[Column] =
    if (args.exists(_.stringTyped)) args.map(_.column.cast("string"))
    else args.map(_.column)

  /** `IF(cond, then, else)` — SPARQL's conditional expression. */
  final case class VEIf(cond: Constraint, t: ValueExpr, f: ValueExpr) extends ValueExpr {
    def column: Column = {
      val Seq(tc, fc) = alignTypes(Seq(t, f))
      when(cond.column, tc).otherwise(fc)
    }
    override def stringTyped: Boolean = t.stringTyped || f.stringTyped
  }
  /** `COALESCE(e, …)` — first bound (non-null) value; the idiomatic
    * default for OPTIONAL-introduced variables.
    */
  final case class VECoalesce(args: Seq[ValueExpr]) extends ValueExpr {
    def column: Column = coalesce(alignTypes(args): _*)
    override def stringTyped: Boolean = args.exists(_.stringTyped)
  }

  /** `DATATYPE(?v)` — the tracked datatype IRI of an object-position
    * variable (`""` for IRIs in this engine's quad storage). Needs the
    * enclosing query compiled with datatype tracking — automatic in the
    * text grammar; a variable never bound in object position resolves
    * to a loud missing-column error.
    */
  final case class VEDatatype(variable: String) extends ValueExpr {
    // language-tagged literals store their tag as "@tag" in the dt slot
    // (RDF 1.1: tag and datatype are mutually exclusive on a literal);
    // DATATYPE must surface the spec datatype, rdf:langString
    def column: Column = {
      val dt = col(variable + DtSuffix)
      when(dt.startsWith("@"), lit(RdfLangString)).otherwise(dt)
    }
    override def stringTyped = true
  }
  /** `LANG(?v)` — the language tag of a tagged literal (`""` for plain /
    * typed literals and IRIs). Tags live in the tracked dt companion as
    * `"@tag"` (mutually exclusive with a datatype per RDF 1.1), so this
    * rides the same opt-in tracking as DATATYPE.
    */
  final case class VELang(variable: String) extends ValueExpr {
    def column: Column = {
      val dt = col(variable + DtSuffix)
      when(dt.startsWith("@"), dt.substr(lit(2), length(dt))).otherwise(lit(""))
    }
    override def stringTyped = true
  }
  /** `LANGMATCHES(tag, range)` — RFC 4647 basic filtering: `"*"` matches
    * any non-empty tag; otherwise case-insensitive exact match or
    * subtag-prefix match (`"en"` matches `"en-GB"`).
    */
  final case class LangMatchesC(tag: ValueExpr, range: ValueExpr) extends Constraint {
    def column: Column = {
      val t = lower(tag.column.cast("string"))
      val r = lower(range.column.cast("string"))
      when(r === "*", t =!= "")
        .otherwise(t === r || t.startsWith(concat(r, lit("-"))))
    }
  }
  /** Term-kind tests over the tracked datatype: `isIRI` / `isBlank`
    * (dt `""`, split on the `_:` bnode prefix), `isLiteral` (dt non-
    * empty), `isNumeric` (dt in the XSD numeric set).
    */
  final case class TermTest(func: String, variable: String) extends Constraint {
    private def dt = col(variable + DtSuffix)
    def column: Column = func match {
      case "ISIRI" => dt === lit("") && !col(variable).startsWith("_:")
      case "ISBLANK" => dt === lit("") && col(variable).startsWith("_:")
      case "ISLITERAL" => dt =!= lit("")
      case "ISNUMERIC" => dt.isin(XsdInteger, XsdDecimal, XsdDouble)
    }
  }

  /** Generalized comparison over value expressions (the simple var-vs-
    * constant / var-vs-var shapes stay [[VarFilter]]/[[VarCompare]]).
    */
  final case class ExprCmp(l: ValueExpr, op: String, r: ValueExpr) extends Constraint {
    def column: Column =
      if (l.stringTyped || r.stringTyped)
        cmp(op, l.column.cast("string"), r.column.cast("string"))
      else cmp(op, l.column.cast("double"), r.column.cast("double"))
  }

  /** A parsed `FILTER(?var op operand)` constraint: `op` is one of
    * `= != < <= > >=`; the operand is numeric (`Left` — both sides
    * compare as doubles, so literal "42" matches 42.0) or a quoted
    * string (`Right` — lexical comparison).
    */
  final case class VarFilter(variable: String, op: String,
                             operand: Either[Double, String]) extends Constraint {
    def column: Column = operand match {
      case Left(num) => cmp(op, col(variable).cast("double"), lit(num))
      case Right(s) => cmp(op, col(variable), lit(s))
    }
  }

  /** `FILTER(?a op ?b)` — two bound variables compared NUMERICALLY
    * (lexical forms cast to double; a non-numeric value yields null and
    * the solution drops, SPARQL's error-eliminates-row behavior).
    */
  final case class VarCompare(a: String, op: String, b: String) extends Constraint {
    def column: Column = cmp(op, col(a).cast("double"), col(b).cast("double"))
  }

  final case class ParsedQuery(patterns: Seq[TriplePattern], filters: Seq[Constraint])

  // ---------------------------------------- FILTER / BIND expressions

  /** Tokenize a FILTER/BIND expression body: quoted strings and `<iri>`
    * tokens are atomic; two-char operators (`&& || != <= >=`) bind
    * before their one-char prefixes; `<` with a matching `>` before any
    * whitespace is an IRI, otherwise the less-than operator.
    */
  private def tokenizeExpr(s: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val j = s.indexOf('"', i + 1)
        require(j >= 0, s"unterminated string literal in '$s'")
        out += s.substring(i, j + 1); i = j + 1
      } else if (c == '&' || c == '|') {
        require(i + 1 < s.length && s(i + 1) == c,
          s"single '$c' is not an operator — use '$c$c' in '$s'")
        out += s.substring(i, i + 2); i += 2
      } else if (c == '!' || c == '>' || c == '=') {
        if (c != '=' && i + 1 < s.length && s(i + 1) == '=') {
          out += s.substring(i, i + 2); i += 2
        } else { out += c.toString; i += 1 }
      } else if (c == '<') {
        // IRI iff a '>' closes the token before any whitespace
        var j = i + 1
        while (j < s.length && !s(j).isWhitespace && s(j) != '>') j += 1
        if (j < s.length && s(j) == '>') { out += s.substring(i, j + 1); i = j + 1 }
        else if (i + 1 < s.length && s(i + 1) == '=') { out += "<="; i += 2 }
        else { out += "<"; i += 1 }
      } else if ("()+-*/,".indexOf(c.toInt) >= 0) { out += c.toString; i += 1 }
      else if (c == '?') {
        var j = i + 1
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        require(j > i + 1, s"bare '?' in '$s'")
        out += s.substring(i, j); i = j
      } else if (c.isDigit) {
        var j = i
        while (j < s.length && (s(j).isDigit || s(j) == '.')) j += 1
        out += s.substring(i, j); i = j
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        out += s.substring(i, j); i = j
      } else throw new IllegalArgumentException(s"unexpected character '$c' in '$s'")
    }
    out.toIndexedSeq
  }

  /** Recursive-descent parser over [[tokenizeExpr]] output. Constraint
    * grammar: `||` over `&&` over `!`/parens/atoms; atoms are
    * comparisons (`expr op expr`), `BOUND(?v)`, or the string tests.
    * Value grammar: `+ -` over `* /` over unary minus / parens /
    * variables / numbers / strings / IRIs / `STRLEN` / `STR` / `CONCAT`.
    */
  private final class ExprParser(toks: IndexedSeq[String]) {
    private var pos = 0
    private def peek: String = if (pos < toks.length) toks(pos) else ""
    private def next(): String = { val t = peek; pos += 1; t }
    private def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t', got '${if (got.isEmpty) "<end>" else got}'")
    }
    def atEnd: Boolean = pos >= toks.length
    def leftover: String = toks.drop(pos).mkString(" ")

    def parseConstraint(): Constraint = {
      var l = parseAndChain()
      while (peek == "||") { next(); l = OrC(l, parseAndChain()) }
      l
    }
    private def parseAndChain(): Constraint = {
      var l = parseUnary()
      while (peek == "&&") { next(); l = AndC(l, parseUnary()) }
      l
    }
    private def parseUnary(): Constraint =
      if (peek == "!") { next(); NotC(parseUnary()) }
      else parseAtom()

    private def parseAtom(): Constraint = {
      if (peek == "(") {
        // ambiguous: boolean group '(?a>1 || ?b<2)' vs arithmetic group
        // '(?a+1) > ?b' — try boolean first, backtrack to a comparison
        val save = pos
        try {
          expect("("); val c = parseConstraint(); expect(")")
          return c
        } catch { case _: IllegalArgumentException => pos = save }
      }
      peek.toUpperCase match {
        case "BOUND" =>
          next(); expect("(")
          val v = next()
          require(v.startsWith("?"), s"BOUND needs a ?variable, got '$v'")
          expect(")")
          BoundC(v.drop(1))
        case f @ ("ISIRI" | "ISBLANK" | "ISLITERAL" | "ISNUMERIC") =>
          next(); expect("(")
          val v = next()
          require(v.startsWith("?"), s"$f needs a ?variable, got '$v'")
          expect(")")
          TermTest(f, v.drop(1))
        case "SAMETERM" =>
          next(); expect("(")
          val l = parseValue(); expect(",")
          val r = parseValue(); expect(")")
          SameTermC(l, r)
        case "LANGMATCHES" =>
          next(); expect("(")
          val tag = parseValue(); expect(",")
          val range = parseValue(); expect(")")
          LangMatchesC(tag, range)
        case f @ ("REGEX" | "STRSTARTS" | "STRENDS" | "CONTAINS") =>
          next(); expect("(")
          val target = parseValue(); expect(",")
          val arg = parseValue()
          var ignoreCase = false
          if (peek == ",") { // REGEX flags — only "i" is supported
            next()
            val flags = next()
            require(f == "REGEX" && flags == "\"i\"",
              s"only the REGEX \"i\" flag is supported, got '$flags' for $f")
            ignoreCase = true
          }
          expect(")")
          StrTest(f, target, arg, ignoreCase)
        case _ =>
          val l = parseValue()
          val t = peek.toUpperCase
          if (t == "IN" || t == "NOT") {
            // SPARQL IN / NOT IN: sugar for an =-chain disjunction, so
            // each member keeps [[mkCmp]]'s numeric-vs-lexical semantics
            val negated = t == "NOT"
            next()
            if (negated) {
              val k = next()
              require(k.equalsIgnoreCase("IN"), s"expected IN after NOT, got '$k'")
            }
            expect("(")
            val vals = scala.collection.mutable.ArrayBuffer(parseValue())
            while (peek == ",") { next(); vals += parseValue() }
            expect(")")
            val anyEq = vals.map(v => mkCmp(l, "=", v): Constraint).reduce(OrC(_, _))
            if (negated) NotC(anyEq) else anyEq
          } else {
            val op = next()
            require(Set("=", "!=", "<", "<=", ">", ">=").contains(op),
              s"expected a comparison operator, got '${if (op.isEmpty) "<end>" else op}'")
            val r = parseValue()
            mkCmp(l, op, r)
          }
      }
    }

    def parseValue(): ValueExpr = {
      var l = parseMul()
      while (peek == "+" || peek == "-") {
        val op = next().head
        l = VEArith(op, l, parseMul())
      }
      l
    }
    private def parseMul(): ValueExpr = {
      var l = parseFactor()
      while (peek == "*" || peek == "/") {
        val op = next().head
        l = VEArith(op, l, parseFactor())
      }
      l
    }
    private def parseFactor(): ValueExpr = {
      val t = peek
      if (t == "-") { next(); VENeg(parseFactor()) }
      else if (t == "(") { next(); val e = parseValue(); expect(")"); e }
      else if (t.startsWith("?")) { next(); VEVar(t.drop(1)) }
      else if (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) {
        next(); VEStr(t.drop(1).dropRight(1))
      } else if (t.startsWith("<") && t.endsWith(">")) {
        next(); VEStr(t.drop(1).dropRight(1)) // IRIs compare lexically
      } else if (t.nonEmpty && t.head.isDigit) {
        next(); VENum(t.toDouble)
      } else t.toUpperCase match {
        case "DATATYPE" =>
          next(); expect("(")
          val v = next()
          require(v.startsWith("?"), s"DATATYPE needs a ?variable, got '$v'")
          expect(")")
          VEDatatype(v.drop(1))
        case "LANG" =>
          next(); expect("(")
          val v = next()
          require(v.startsWith("?"), s"LANG needs a ?variable, got '$v'")
          expect(")")
          VELang(v.drop(1))
        case "STRLEN" => next(); expect("("); val e = parseValue(); expect(")"); VEStrLen(e)
        case f @ ("ABS" | "ROUND" | "CEIL" | "FLOOR") =>
          next(); expect("("); val e = parseValue(); expect(")"); VENumFn(f, e)
        case f @ ("YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" | "SECONDS" | "TZ") =>
          next(); expect("("); val e = parseValue(); expect(")"); VEDateFn(f, e)
        case "ENCODE_FOR_URI" =>
          next(); expect("("); val e = parseValue(); expect(")"); VEEncodeUri(e)
        case "STRDT" =>
          next(); expect("(")
          val e = parseValue(); expect(",")
          val d = next()
          require(d.startsWith("<") && d.endsWith(">"),
            s"STRDT needs an <iri> datatype, got '$d'")
          expect(")")
          VEStrDt(e, d.drop(1).dropRight(1))
        case "STRLANG" =>
          next(); expect("(")
          val e = parseValue(); expect(",")
          val tg = next()
          require(tg.startsWith("\"") && tg.endsWith("\"") && tg.length > 2,
            s"STRLANG needs a quoted language tag, got '$tg'")
          expect(")")
          VEStrLang(e, tg.drop(1).dropRight(1))
        case f @ ("MD5" | "SHA256") =>
          next(); expect("("); val e = parseValue(); expect(")"); VEHash(f, e)
        case "IRI" | "URI" =>
          next(); expect("("); val e = parseValue(); expect(")"); VEIri(e)
        case f @ ("UCASE" | "LCASE") =>
          next(); expect("("); val e = parseValue(); expect(")"); VECase(f, e)
        case "SUBSTR" =>
          next(); expect("(")
          val e = parseValue(); expect(",")
          val start = parseValue()
          val len = if (peek == ",") { next(); Some(parseValue()) } else None
          expect(")")
          VESubstr(e, start, len)
        case "REPLACE" =>
          next(); expect("(")
          val e = parseValue(); expect(",")
          val pat = parseValue(); expect(",")
          val rep = parseValue(); expect(")")
          VEReplace(e, pat, rep)
        case f @ ("STRBEFORE" | "STRAFTER") =>
          next(); expect("(")
          val e = parseValue(); expect(",")
          val d = next()
          require(d.startsWith("\"") && d.endsWith("\"") && d.length >= 2,
            s"$f needs a quoted literal delimiter, got '$d'")
          expect(")")
          VEStrSplit(f, e, d.drop(1).dropRight(1))
        case "STR" => next(); expect("("); val e = parseValue(); expect(")"); VEStrCast(e)
        case "CONCAT" =>
          next(); expect("(")
          val args = scala.collection.mutable.ArrayBuffer(parseValue())
          while (peek == ",") { next(); args += parseValue() }
          expect(")")
          VEConcat(args.toSeq)
        case "IF" =>
          next(); expect("(")
          val cond = parseConstraint(); expect(",")
          val t = parseValue(); expect(",")
          val f = parseValue(); expect(")")
          VEIf(cond, t, f)
        case "COALESCE" =>
          next(); expect("(")
          val args = scala.collection.mutable.ArrayBuffer(parseValue())
          while (peek == ",") { next(); args += parseValue() }
          expect(")")
          VECoalesce(args.toSeq)
        case _ => throw new IllegalArgumentException(
          s"unrecognized expression token '${if (t.isEmpty) "<end>" else t}'")
      }
    }
  }

  /** Comparison constructor: the simple shapes keep their dedicated
    * (public, pattern-matchable) classes; everything else generalizes.
    */
  private def mkCmp(l: ValueExpr, op: String, r: ValueExpr): Constraint = (l, r) match {
    case (VEVar(a), VEVar(b)) => VarCompare(a, op, b)
    case (VEVar(a), VENum(d)) => VarFilter(a, op, Left(d))
    case (VEVar(a), VEStr(s)) => VarFilter(a, op, Right(s))
    case _ => ExprCmp(l, op, r)
  }

  /** Parse one FILTER/HAVING expression body (the text between the
    * outer parens) into a [[Constraint]]; raises on trailing tokens.
    */
  def parseFilterExpr(body: String): Constraint = {
    val p = new ExprParser(tokenizeExpr(body))
    val c = p.parseConstraint()
    require(p.atEnd, s"trailing tokens after FILTER expression: '${p.leftover}'")
    c
  }

  /** Parse one BIND value expression (the text left of ` AS `). */
  def parseValueExpr(body: String): ValueExpr = {
    val p = new ExprParser(tokenizeExpr(body))
    val e = p.parseValue()
    require(p.atEnd, s"trailing tokens after BIND expression: '${p.leftover}'")
    e
  }

  /** Find every `KEYWORD ( … )` clause (balanced parens) in `s`, parse
    * each body with `parse`, and blank the consumed spans. A `KEYWORD`
    * not followed by `(` is left in place (e.g. `FILTER EXISTS { … }`,
    * which [[compileGroup]] extracts separately). Runs on literal-MASKED
    * text; `um` restores literals before the body parse.
    */
  private def extractParenClauses[A](s: String, keyword: String,
                                     um: String => String,
                                     parse: String => A): (Seq[A], String) = {
    val out = scala.collection.mutable.ArrayBuffer[A]()
    val sb = new StringBuilder(s)
    val kwRe = s"(?i)\\b$keyword\\b".r
    for (m <- kwRe.findAllMatchIn(s)) {
      var i = m.end
      while (i < s.length && s(i).isWhitespace) i += 1
      if (i < s.length && s(i) == '(') {
        var depth = 0
        var j = i
        var endIdx = -1
        while (j < s.length && endIdx < 0) {
          if (s(j) == '(') depth += 1
          else if (s(j) == ')') { depth -= 1; if (depth == 0) endIdx = j }
          j += 1
        }
        require(endIdx >= 0, s"unbalanced parens after $keyword in '$s'")
        out += parse(um(s.substring(i + 1, endIdx)))
        for (k <- m.start to endIdx) sb.setCharAt(k, ' ')
      }
    }
    (out.toSeq, sb.toString)
  }

  /** Pull every `FILTER( … )` clause out of `s` — which may be
    * literal-MASKED text (see `maskLiterals`); `um` restores masked
    * literals before the expression parse. Returns (filters, remaining
    * text with the clauses blanked). `FILTER EXISTS`/`FILTER NOT
    * EXISTS` brace forms are NOT consumed here.
    */
  private def extractFilters(s: String,
                             um: String => String = identity): (Seq[Constraint], String) =
    extractParenClauses(s, "FILTER", um, parseFilterExpr)

  /** A parsed `BIND(expr AS ?alias)` clause. */
  final case class Binding(alias: String, expr: ValueExpr)

  private val AsAliasRe = """(?is)^(.*)\bAS\s+\?(\w+)\s*$""".r
  private val AsAliasParenRe = """(?is)^\((.*)\bAS\s+\?(\w+)\s*\)$""".r

  /** Pull every `BIND(expr AS ?v)` clause out of masked text. The
    * ` AS ?alias` split runs on the still-MASKED body (a literal
    * containing ` AS ?x` can't hijack it); only the expression part is
    * unmasked, for the tokenizer.
    */
  private def extractBinds(s: String,
                           um: String => String = identity): (Seq[Binding], String) =
    extractParenClauses(s, "BIND", identity, body => body match {
      case AsAliasRe(expr, alias) => Binding(alias, parseValueExpr(um(expr)))
      case _ => throw new IllegalArgumentException(
        s"BIND needs the form 'BIND(expr AS ?var)', got 'BIND(${um(body)})'")
    })

  /** [[parsePatterns]] plus SPARQL's most common constraint form:
    * `FILTER(?v op const)` clauses anywhere in the block (numeric or
    * quoted-string operand). Literal-safe: quoted literals are masked
    * first, so an object literal containing `FILTER(...)` stays data.
    * Returns the patterns and the parsed filters; compile with
    * [[bgpFiltered]].
    */
  def parseQuery(block: String): ParsedQuery = {
    // mask literals AND IRIs before clause extraction: an IRI like
    // <urn:x/FILTER(y)> must never feed the FILTER scanner
    val (litMasked, lits) = maskLiterals(block)
    val (masked, iris) = maskIris(litMasked)
    def um(x: String): String = unmask(unmaskIris(x, iris), lits)
    val (filters, rest) = extractFilters(masked, um)
    ParsedQuery(parsePatterns(um(rest)), filters)
  }

  /** [[bgp]] with post-join FILTER constraints: each filter is one
    * `Column` predicate over the solution bindings. Catalyst pushes a
    * filter that touches a single pattern's variable back below the join
    * on its own — declaring it post-join keeps SPARQL's semantics (filters
    * see the whole solution row) without giving up pushdown.
    */
  def bgpFiltered(quads: DataFrame, patterns: Seq[TriplePattern],
                  filters: Seq[Constraint]): DataFrame =
    applyFilters(bgp(quads, patterns), filters)

  /** Apply FILTER constraints to ANY solution-bindings frame — composes
    * with [[bgpQuads]]/[[bgpOptional]]/[[bgpUnion]] output just as with
    * [[bgp]]'s.
    */
  def applyFilters(bindings: DataFrame, filters: Seq[Constraint]): DataFrame =
    filters.foldLeft(bindings)((acc, f) => acc.filter(f.column))

  /** Run a parsed query (patterns + filters) — the one-call form of
    * `bgpFiltered(quads, q.patterns, q.filters)`.
    */
  def bgpQuery(quads: DataFrame, q: ParsedQuery): DataFrame =
    bgpFiltered(quads, q.patterns, q.filters)

  /** BGP over a quad table with a MIX of graph-constrained and
    * graph-agnostic patterns: a `Some(term)` graph constrains that
    * pattern's quads (constant or variable, as in [[bgpQuads]]); `None`
    * matches quads in ANY graph — SPARQL's default-scope pattern inside
    * a query that also uses GRAPH blocks.
    */
  def bgpMixed(quads: DataFrame, patterns: Seq[(Option[Term], TriplePattern)],
               trackDt: Boolean = false): DataFrame = {
    require(patterns.nonEmpty, "empty pattern list")
    compilePatterns(quads, patterns.map { case (g, p) =>
      Seq("subj" -> p.s, "pred" -> p.p, "obj" -> p.o) ++ g.map("graph" -> _)
    }, trackDt)
  }

  private val OptionalRe = """(?i)OPTIONAL\s*\{([^{}]*)\}""".r
  private val MinusRe = """(?i)MINUS\s*\{([^{}]*)\}""".r
  /** The graph term alternatives include a masked-IRI placeholder —
    * [[compileGroup]] scans text whose `<…>` IRIs are already opaque
    * `␂idx␂` tokens.
    */
  private val GraphBlockRe =
    ("""(?i)GRAPH\s+(\?\w+|<[^>]+>|"[^"]*"|""" + 2.toChar + """\d+""" + 2.toChar +
      """)\s*\{([^{}]*)\}""").r
  private val ValuesRe = """(?i)VALUES\s+\?(\w+)\s*\{([^{}]*)\}""".r
  private val ValuesMultiRe = """(?i)VALUES\s*\(((?:\s*\?\w+)+)\s*\)\s*\{([^{}]*)\}""".r

  /** SPARQL VALUES (single-variable form): restrict a variable to an
    * inline constant list — compiled as an inner join against a local
    * relation (Catalyst broadcasts it; for a handful of values the
    * optimizer folds it to an IN-filter-shaped plan). The variable must
    * be bound by the pattern block (a free VALUES var would be a
    * cartesian — rejected).
    */
  def bgpValues(bindings: DataFrame, variable: String, values: Seq[String]): DataFrame = {
    require(bindings.columns.contains(variable),
      s"VALUES variable ?$variable is not bound by the pattern block")
    require(values.nonEmpty, s"empty VALUES list for ?$variable")
    val spark = bindings.sparkSession
    import spark.implicits._
    bindings.join(broadcast(values.toDF(variable).distinct()), Seq(variable))
  }

  /** SPARQL VALUES (multi-variable form): `VALUES (?a ?b) { (<x> "1")
    * (<y> "2") }` — an inline solution RELATION inner-joined onto the
    * bindings across all its variables (broadcast: inline data is
    * driver-literal by construction). Every variable must be bound by
    * the pattern block; every row must carry the full arity (UNDEF is
    * not supported — rejected loudly, not silently null-joined).
    */
  def bgpValuesMulti(bindings: DataFrame, vars: Seq[String],
                     rows: Seq[Seq[String]]): DataFrame = {
    require(vars.nonEmpty, "VALUES needs at least one variable")
    vars.foreach(v => require(bindings.columns.contains(v),
      s"VALUES variable ?$v is not bound by the pattern block"))
    require(rows.nonEmpty, s"empty VALUES list for (${vars.map("?" + _).mkString(" ")})")
    rows.foreach(r => require(r.size == vars.size,
      s"VALUES row arity ${r.size} != variable arity ${vars.size}"))
    val spark = bindings.sparkSession
    val schema = StructType(vars.map(v => StructField(v, StringType)))
    val rel = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r: _*)): _*), schema).distinct()
    bindings.join(broadcast(rel), vars)
  }

  /** Compile a SPARQL-SHAPED query text in one call — the composed form
    * of the whole pattern surface:
    *
    * {{{
    * select(quads, """
    *   SELECT ?n (COUNT(*) AS ?n_members) WHERE {
    *     { ?m <urn:s#ref> ?n }
    *     UNION
    *     { ?m <urn:c#ref> ?n . ?n <urn:n#rk> ?rk . FILTER(?rk >= 2) .
    *       OPTIONAL { ?m <urn:label> ?lbl } .
    *       GRAPH ?g { ?n <urn:n#name> ?nm } }
    *   } GROUP BY ?n ORDER BY ?n LIMIT 10
    * """)
    * }}}
    *
    * Grammar (subset, not full SPARQL): triple patterns with ` . `
    * separators; `FILTER(expr)` where expr composes comparisons
    * (`= != < <= > >=` over variables, numbers, strings, IRIs,
    * `STRLEN/STR/CONCAT` calls and `+ - * /` arithmetic) with
    * `&& || !` and parens, plus the predicates `BOUND(?v)`,
    * `REGEX(?v, "pat"[, "i"])`, `STRSTARTS/STRENDS/CONTAINS(?v, "s")`;
    * `FILTER EXISTS { patterns }` / `FILTER NOT EXISTS { patterns }`
    * (semi/anti join on shared variables); `BIND(expr AS ?v)`;
    * `{ SELECT … }` sub-selects (compiled recursively, joined on their
    * projected shared variables); `OPTIONAL { patterns [FILTERs] }`
    * (left-joined on shared variables, FILTERs inside apply to the
    * optional side before the join); `MINUS { patterns [FILTERs] }`
    * (left-anti on shared variables — NOT EXISTS);
    * `VALUES ?v { <iri> "lit" … }` (inline constants, broadcast
    * inner join); `GRAPH ?g|<iri>|"" { patterns }`
    * (requires a `graph` column); `UNION` between top-level groups
    * (brace the groups) — solutions union by name, branch-unbound
    * variables null; property paths `<p>+` / `<p>*` and sequences
    * `<a>/<b>` in predicate position (see [[parsePatterns]] — closure
    * predicates are bridged automatically, which makes a path-bearing
    * query EAGER at call time: the closure loop runs Spark jobs).
    *
    * Solution modifiers (the `SELECT … WHERE { … }` form; a bare
    * pattern block without the head returns all bindings as before):
    * projection by variable, `DISTINCT`, aggregate projections
    * `(COUNT(*)|COUNT(?v)|COUNT(DISTINCT ?v)|SUM(?v)|MIN(?v)|MAX(?v)|
    * AVG(?v)|SAMPLE(?v)|GROUP_CONCAT(?v[; SEPARATOR="s"]) AS ?alias)`
    * (SAMPLE picks the minimum and GROUP_CONCAT sorts its
    * values — both deterministic where SPARQL leaves the choice
    * implementation-defined) with `GROUP BY ?v …` (SUM/AVG cast the lexical
    * form to double; MIN/MAX compare lexically; COUNT(?v) counts bound
    * solutions), `HAVING(?alias op const)`,
    * `ORDER BY [ASC|DESC](?v) …`, `LIMIT n`, `OFFSET n` (OFFSET skips
    * before LIMIT caps, SPARQL's slice order). Unparseable trailing
    * text raises — never silently ignored. (One deliberate limitation:
    * a variable literally named `?where` is not usable in the headed
    * form.) UNION/brace splitting is quote- and IRI-aware (a literal
    * containing `UNION` or `{`, or an IRI containing `union`, is safe).
    * The sibling query forms: [[constructQuery]], [[askQuery]],
    * [[describeQuery]], or the keyword-dispatching [[query]].
    */
  def select(quads: DataFrame, text0: String): DataFrame = {
    val text = expandPrefixes(text0)
    val (masked, lits) = maskLiterals(text)
    masked match {
      case SelectHeadRe(head, rest) =>
        val (dataset, headSansFrom) = extractDataset(head)
        val (distinct, projs) = parseProjections(headSansFrom, unmask(_, lits))
        val (bodyMasked, tailMasked) = extractBraceBlock(rest)
        // a head projecting DATATYPE/LANG needs the dt companions the
        // body would otherwise drop — force tracking into every branch
        // and keep the companions through to the head projection
        val headDt = DtFuncRe.findFirstIn(headSansFrom).isDefined
        applyModifiers(
          compileBody(quads, unmask(bodyMasked, lits), dataset, keepDt = headDt),
          distinct, projs, tailMasked, unmask(_, lits))
      case _ => compileBody(quads, text)
    }
  }

  private val FromNamedRe = """(?i)\bFROM\s+NAMED\s+<([^<>\s]*)>""".r
  private val FromRe = """(?i)\bFROM\s+<([^<>\s]*)>""".r

  /** The RDF dataset a SELECT runs against: `FROM <g>` graphs form the
    * default graph (patterns outside GRAPH blocks match only them);
    * `FROM NAMED <g>` graphs are the ones GRAPH blocks may select.
    * `None` = no dataset clause, the full quad table on both sides.
    */
  final case class Dataset(defaults: Seq[String], named: Seq[String])

  /** Strip `FROM` / `FROM NAMED` clauses out of the SELECT head. Per
    * SPARQL, ANY dataset clause fully specifies the dataset: with only
    * `FROM NAMED`, the default graph is empty (and vice versa).
    */
  private def extractDataset(head: String): (Option[Dataset], String) = {
    val named = FromNamedRe.findAllMatchIn(head).map(_.group(1)).toSeq
    val h1 = FromNamedRe.replaceAllIn(head, " ")
    val defaults = FromRe.findAllMatchIn(h1).map(_.group(1)).toSeq
    val h2 = FromRe.replaceAllIn(h1, " ")
    if (named.isEmpty && defaults.isEmpty) (None, head)
    else (Some(Dataset(defaults, named)), h2)
  }

  /** `CONSTRUCT { template } WHERE { body }` through the text grammar —
    * the body accepts everything [[select]]'s pattern surface does
    * (UNION/FILTER/OPTIONAL/MINUS/GRAPH/VALUES/paths), the template is a
    * plain pattern block instantiated per solution via [[construct]]
    * (set semantics: output triples are distinct).
    */
  def constructQuery(quads: DataFrame, text0: String): DataFrame = {
    val text = expandPrefixes(text0)
    val (masked, lits) = maskLiterals(text)
    val afterKeyword = masked match {
      case ConstructHeadRe(rest) => rest
      case _ => throw new IllegalArgumentException(
        s"constructQuery expects 'CONSTRUCT { … } WHERE { … }', got '$text'")
    }
    afterKeyword match {
      // CONSTRUCT WHERE { plain patterns }: SPARQL's short form — the
      // pattern block doubles as the template (parsePatterns rejects
      // FILTER/OPTIONAL/… in it loudly, as the spec requires a plain BGP)
      case WhereTailRe(rest) =>
        val (bodyMasked, tail) = extractBraceBlock(rest)
        require(tail.trim.isEmpty, s"unrecognized text after WHERE block: '${tail.trim}'")
        val body = unmask(bodyMasked, lits)
        construct(compileBody(quads, body), parsePatterns(body))
      case _ =>
        val (tmplMasked, afterTemplate) = extractBraceBlock(afterKeyword)
        val afterWhere = afterTemplate match {
          case WhereTailRe(rest) => rest
          case _ => throw new IllegalArgumentException(
            s"expected WHERE after the CONSTRUCT template in '$text'")
        }
        val (bodyMasked, tail) = extractBraceBlock(afterWhere)
        require(tail.trim.isEmpty, s"unrecognized text after WHERE block: '${tail.trim}'")
        construct(compileBody(quads, unmask(bodyMasked, lits)),
          parsePatterns(unmask(tmplMasked, lits)))
    }
  }

  /** `ASK { body }` through the text grammar: one row, one boolean
    * column `matched`; the body accepts the full pattern surface. Lazy
    * like [[ask]] (short-circuits at the first solution) — unless the
    * body uses `+`/`*` paths, whose bridging is eager.
    */
  def askQuery(quads: DataFrame, text0: String): DataFrame = {
    val text = expandPrefixes(text0)
    val (masked, lits) = maskLiterals(text)
    val rest = masked match {
      case AskHeadRe(r) => r
      case _ => throw new IllegalArgumentException(
        s"askQuery expects 'ASK { … }', got '$text'")
    }
    val (bodyMasked, tail) = extractBraceBlock(rest)
    require(tail.trim.isEmpty, s"unrecognized text after ASK block: '${tail.trim}'")
    compileBody(quads, unmask(bodyMasked, lits)).limit(1)
      .select(lit(1).as("one"))
      .agg((count(col("one")) > 0).as("matched"))
  }

  /** `DESCRIBE <iri>` through the text grammar — the symmetric concise
    * bounded description of [[describe]].
    */
  def describeQuery(quads: DataFrame, text0: String): DataFrame =
    expandPrefixes(text0).trim match {
      case DescribeHeadRe(iri) => describe(quads, iri)
      case DescribeVarHeadRe(v, body) =>
        // DESCRIBE ?v WHERE { … }: the body runs through the full
        // select() surface; every distinct binding of ?v is described.
        // Both description legs are semi-joins keyed on the node IRI —
        // the matched-node set is usually tiny relative to the graph,
        // so Catalyst broadcasts it and the graph is never shuffled.
        val nodes = select(quads, s"SELECT ?$v WHERE { $body }").distinct()
        quads.join(nodes.select(col(v).as("subj")), Seq("subj"), "left_semi")
          .unionByName(
            quads.filter(col("dt") === "")
              .join(nodes.select(col(v).as("obj")), Seq("obj"), "left_semi")
              .select(quads.columns.map(col).toSeq: _*))
          .distinct()
      case _ => throw new IllegalArgumentException(
        s"describeQuery expects 'DESCRIBE <iri>' or 'DESCRIBE ?v WHERE { … }', got '$text0'")
    }

  /** One entry point for every query form — dispatches on the leading
    * keyword: `SELECT …` / bare pattern block → [[select]],
    * `CONSTRUCT …` → [[constructQuery]], `ASK …` → [[askQuery]],
    * `DESCRIBE <iri>` → [[describeQuery]].
    */
  def query(quads: DataFrame, text0: String): DataFrame = {
    // expand here too (not just in the dispatched form): the dispatch
    // regexes must see the query FORM keyword, not a PREFIX header
    val text = expandPrefixes(text0)
    val (masked, _) = maskLiterals(text)
    if (ConstructHeadRe.pattern.matcher(masked).matches()) constructQuery(quads, text)
    else if (AskHeadRe.pattern.matcher(masked).matches()) askQuery(quads, text)
    else if (DescribeHeadRe.pattern.matcher(text.trim).matches() ||
             DescribeVarHeadRe.pattern.matcher(text.trim).matches()) describeQuery(quads, text)
    else if (UpdateFormRe.findFirstIn(masked).isDefined)
      // update forms return the UPDATED table: the 5-column named-graph
      // surface when the input carries a graph column, else the plain one
      if (quads.columns.contains("graph")) updateQuadsQuery(quads, text)
      else updateQuery(quads, text)
    else select(quads, text)
  }

  private val UpdateFormRe =
    """(?is)^\s*(?:INSERT|DELETE|CLEAR|DROP|CREATE|ADD|COPY|MOVE|WITH)\b""".r

  private val PrefixDeclRe = """(?is)^\s*PREFIX\s+(\w+):\s*<([^<>\s]*)>""".r

  /** Strip leading `PREFIX name: <iri>` declarations and expand every
    * `name:local` CURIE in the remaining text to `<irilocal>`. Literal-
    * and IRI-masked before the rewrite, so a literal `"dm:x"` or an IRI
    * containing a declared prefix stays data. Local names follow the
    * word/`#`/`.`/`-` shape (no `/`, so a path sequence `dm:a/dm:b`
    * splits into two CURIEs, exactly as SPARQL's PN_LOCAL would); a
    * closure suffix after the CURIE (`dm:parent+`) survives because the
    * local-name class excludes `+*?`.
    */
  private val BaseDeclRe = """(?is)^\s*BASE\s+<([^<>\s]*)>""".r
  private val AbsoluteIriRe = """^[A-Za-z][A-Za-z0-9+.\-]*:""".r

  def expandPrefixes(text: String): String = {
    // prologue: BASE and PREFIX declarations in any interleaving (a
    // PREFIX expansion is NOT base-resolved — per SPARQL, prefix IRIs
    // resolve against the base at declaration; callers here always
    // declare absolute prefix IRIs)
    val decls = scala.collection.mutable.LinkedHashMap[String, String]()
    var base: Option[String] = None
    var rest = text
    var progressing = true
    while (progressing) {
      (PrefixDeclRe.findFirstMatchIn(rest), BaseDeclRe.findFirstMatchIn(rest)) match {
        case (Some(m), _) =>
          decls += m.group(1) -> m.group(2)
          rest = rest.substring(m.end)
        case (None, Some(b)) =>
          base = Some(b.group(1))
          rest = rest.substring(b.end)
        case _ => progressing = false
      }
    }
    if (decls.isEmpty && base.isEmpty) return text
    val (litMasked, lits) = maskLiterals(rest)
    val (masked, iris0) = maskIris(litMasked)
    // BASE: resolve every RELATIVE <iri> token against it (RFC 3986 via
    // the core resolver the W3C suites gate); absolute IRIs untouched
    val iris = base match {
      case Some(b) => iris0.map { tok =>
        val v = tok.stripPrefix("<").stripSuffix(">")
        if (AbsoluteIriRe.findFirstIn(v).isDefined) tok
        else "<" + jsonld.core.Uri.resolve(b, v) + ">"
      }
      case None => iris0
    }
    val expanded =
      if (decls.isEmpty) masked
      else {
        val curieRe = ("""(?<![\w:<])(""" +
          decls.keys.map(java.util.regex.Pattern.quote).mkString("|") +
          """):([\w#.\-]*[\w#\-])""").r
        curieRe.replaceAllIn(masked, mm =>
          java.util.regex.Matcher.quoteReplacement("<" + decls(mm.group(1)) + mm.group(2) + ">"))
      }
    unmask(unmaskIris(expanded, iris), lits)
  }

  private val SelectHeadRe = """(?is)^\s*SELECT\b(.*?)\bWHERE\b(.*)$""".r
  private val ConstructHeadRe = """(?is)^\s*CONSTRUCT\b(.*)$""".r
  private val WhereTailRe = """(?is)^\s*WHERE\b(.*)$""".r
  private val AskHeadRe = """(?is)^\s*ASK\b(.*)$""".r
  private val DescribeHeadRe = """(?is)^\s*DESCRIBE\s+<([^<>\s]*)>\s*$""".r
  private val DescribeVarHeadRe = """(?is)^\s*DESCRIBE\s+\?(\w+)\s+WHERE\s*\{(.*)\}\s*$""".r

  /** The pattern surface below the optional SELECT head: compile the
    * UNION branches (each branch bridges its own `<p>+`/`<p>*` closure
    * predicates and compiles its sub-select blocks against the RAW
    * quads — a subquery re-enters [[select]] and does its own
    * bridging), drop the internal sequence-hop columns.
    */
  private def compileBody(quads: DataFrame, body: String,
                          dataset: Option[Dataset] = None,
                          keepDt: Boolean = false): DataFrame = {
    val df = splitTopLevelUnion(body)
      .map(compileGroup(quads, _, dataset, forceTrackDt = keepDt))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // drop internal columns: sequence-hop variables and tracked-datatype
    // companions (`?x__dt` is reserved alongside `?__seqN`) — unless the
    // caller's SELECT head still needs the companions
    df.drop(df.columns.filter(c =>
      c.startsWith(SeqVarPrefix) || (!keepDt && c.endsWith(DtSuffix))).toSeq: _*)
  }

  /** Augment `quads` with the virtual closure triples for every `<p>+` /
    * `<p>*` path predicate the body mentions (literal-masked scan, so a
    * literal containing a path lookalike stays data). EAGER: each
    * closure materializes when this runs — at 100× scale these are
    * stored, incrementally maintained closure tables and this bridge
    * compiles against them instead.
    */
  private def bridgePaths(quads: DataFrame, body: String): DataFrame = {
    val (masked, _) = maskLiterals(body)
    // suffix must END the token (lookahead: whitespace / sequence '/' /
    // alternation '|' / end) — '<p>?x' is a malformed term, not a path
    val found = "<([^<>\\s]*)>([+*?])(?=[\\s/|]|$)".r.findAllMatchIn(masked)
      .map(m => (m.group(1), m.group(2))).toSeq.distinct
    found.foldLeft(quads) {
      case (q, (p, "+")) => withPathClosure(q, p)
      case (q, (p, "*")) => withPathStarClosure(q, p)
      case (q, (p, _)) => withPathOptClosure(q, p)
    }
  }

  // ---------------------------------------------- solution modifiers

  /** One SELECT-head projection: a plain variable, an aggregate, or a
    * value-expression alias.
    */
  sealed private trait Proj
  private final case class ProjVar(name: String) extends Proj
  /** `(expr AS ?alias)` — non-aggregate expression projection. */
  private final case class ProjExpr(expr: ValueExpr, alias: String) extends Proj
  /** `arg = None` is `COUNT(*)`; `distinctArg` is `COUNT(DISTINCT ?v)`;
    * `sep` is GROUP_CONCAT's SEPARATOR.
    */
  private final case class ProjAgg(func: String, arg: Option[String],
                                   alias: String,
                                   distinctArg: Boolean = false,
                                   sep: Option[String] = None,
                                   exprArg: Option[ValueExpr] = None) extends Proj

  private val AggProjRe =
    """(?i)^\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)\s+AS\s+\?(\w+)\s*\)$""".r
  // aggregate over a full value EXPRESSION — `(SUM(?price * ?qty) AS ?rev)`;
  // tried after the simple-variable form, before plain expression projs
  private val AggExprProjRe =
    """(?i)^\(\s*(SUM|MIN|MAX|AVG)\s*\(\s*(.+)\s*\)\s+AS\s+\?(\w+)\s*\)$""".r
  private val GroupConcatRe =
    """(?i)^\(\s*GROUP_CONCAT\s*\(\s*\?(\w+)\s*(?:;\s*SEPARATOR\s*=\s*("[^"]*")\s*)?\)\s+AS\s+\?(\w+)\s*\)$""".r
  private val GroupByRe = """(?i)\bGROUP\s+BY((?:\s+\?\w+)+)""".r
  private val OrderByRe =
    """(?i)\bORDER\s+BY((?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))+)""".r
  private val OrderKeyRe = """(?i)(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+)""".r
  private val LimitRe = """(?i)\bLIMIT\s+(\d+)""".r
  private val OffsetRe = """(?i)\bOFFSET\s+(\d+)""".r
  private val VarRe = """\?(\w+)""".r

  /** Parse the text between SELECT and WHERE: optional DISTINCT, then
    * `*` (or nothing) for all-bindings, else `?var` and
    * `(AGG(…) AS ?alias)` projections in output order.
    */
  private def parseProjections(head: String,
                               um: String => String = identity): (Boolean, Seq[Proj]) = {
    var h = head.trim
    // REDUCED permits (but does not require) duplicate elimination —
    // eliminating is always a conforming implementation, so it compiles
    // exactly like DISTINCT
    val reduced = h.toUpperCase.startsWith("REDUCED")
    if (reduced) h = h.substring("REDUCED".length).trim
    val distinct = reduced || h.toUpperCase.startsWith("DISTINCT")
    if (!reduced && distinct) h = h.substring("DISTINCT".length).trim
    if (h.isEmpty || h == "*") (distinct, Seq.empty)
    else {
      val projs = headTokens(h).map {
        case GroupConcatRe(arg, sep, alias) =>
          ProjAgg("GROUP_CONCAT", Some(arg), alias,
            sep = Option(sep).map(s => um(s).drop(1).dropRight(1)))
        case AggProjRe(func, dist, arg, alias) =>
          val f = func.toUpperCase
          if (dist != null) require(f != "SAMPLE",
            "SAMPLE(DISTINCT) is meaningless — SAMPLE already picks one value")
          require(!(f == "SAMPLE" && arg == "*"), "SAMPLE needs a ?variable")
          ProjAgg(f, if (arg == "*") None else Some(arg.drop(1)), alias,
            distinctArg = dist != null)
        case t if VarRe.pattern.matcher(t).matches() => ProjVar(t.drop(1))
        case AggExprProjRe(func, inner, alias) =>
          ProjAgg(func.toUpperCase, None, alias,
            exprArg = Some(parseValueExpr(um(inner))))
        case t @ AsAliasParenRe(expr, alias) =>
          // non-aggregate expression projection: `(?a * 2 AS ?x)`
          ProjExpr(parseValueExpr(um(expr)), alias)
        case t => throw new IllegalArgumentException(
          s"unrecognized SELECT projection '$t'")
      }.toSeq
      (distinct, projs)
    }
  }

  /** Split a SELECT head into projection tokens: whitespace-separated
    * bare terms plus `(...)` groups kept whole at ARBITRARY paren depth
    * (a regex can't nest unboundedly — `(ENCODE_FOR_URI(CONCAT(?a,
    * "x")) AS ?e)` is already three deep). The head text is literal-
    * masked by the caller, so parens inside literals can't unbalance
    * the scan.
    */
  private def headTokens(h: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < h.length) {
      if (h(i).isWhitespace) i += 1
      else if (h(i) == '(') {
        val start = i
        var depth = 0
        var done = false
        while (i < h.length && !done) {
          if (h(i) == '(') depth += 1
          else if (h(i) == ')') { depth -= 1; if (depth == 0) done = true }
          i += 1
        }
        require(done, s"unbalanced parens in SELECT head: '$h'")
        out += h.substring(start, i)
      } else {
        val start = i
        while (i < h.length && !h(i).isWhitespace) i += 1
        out += h.substring(start, i)
      }
    }
    out.toSeq
  }

  /** The simple-argument (`*` / `?var`) aggregate column of a ProjAgg. */
  private def simpleAggColumn(a: ProjAgg): Column = a.func match {
    case "COUNT" if a.distinctArg =>
      countDistinct(col(a.arg.getOrElse(
        throw new IllegalArgumentException("COUNT(DISTINCT) needs a ?variable"))))
    case "COUNT" => a.arg.map(v => count(col(v))).getOrElse(count(lit(1)))
    case "SUM" if a.distinctArg => sum_distinct(col(a.arg.getOrElse(
      throw new IllegalArgumentException("SUM needs a ?variable"))).cast("double"))
    case "SUM" => sum(col(a.arg.getOrElse(
      throw new IllegalArgumentException("SUM needs a ?variable"))).cast("double"))
    // AVG DISTINCT = sum of distinct values / their count; MIN/MAX over
    // DISTINCT are spec-identical to the plain forms (fall through)
    case "AVG" if a.distinctArg =>
      val v = col(a.arg.getOrElse(
        throw new IllegalArgumentException("AVG needs a ?variable"))).cast("double")
      sum_distinct(v) / countDistinct(v)
    case "AVG" => avg(col(a.arg.getOrElse(
      throw new IllegalArgumentException("AVG needs a ?variable"))).cast("double"))
    case "MIN" => min(col(a.arg.getOrElse(
      throw new IllegalArgumentException("MIN needs a ?variable"))))
    case "MAX" => max(col(a.arg.getOrElse(
      throw new IllegalArgumentException("MAX needs a ?variable"))))
    // SPARQL leaves SAMPLE's pick implementation-defined; min makes it
    // deterministic (and cross-engine replayable)
    case "SAMPLE" => min(col(a.arg.get))
    // SPARQL leaves GROUP_CONCAT's order implementation-defined; sorting
    // before the join makes it deterministic across partitionings/
    // retries — the only shuffle-stable choice
    case "GROUP_CONCAT" =>
      array_join(array_sort(collect_list(col(a.arg.get).cast("string"))),
        a.sep.getOrElse(" "))
  }

  /** Compile the tail modifiers onto the solution bindings: aggregate /
    * group, project, DISTINCT, ORDER BY, LIMIT — in SPARQL's evaluation
    * order. Raises on unrecognized trailing text.
    */
  private def applyModifiers(bindings: DataFrame, distinct: Boolean,
                             projs: Seq[Proj], tail: String,
                             um: String => String = identity): DataFrame = {
    val groupVars = GroupByRe.findFirstMatchIn(tail)
      .map(m => VarRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
      .getOrElse(Seq.empty)
    val orderKeys = OrderByRe.findFirstMatchIn(tail)
      .map(m => OrderKeyRe.findAllMatchIn(m.group(1)).map { k =>
        if (k.group(3) != null) (k.group(3), false)
        else (k.group(2), k.group(1).equalsIgnoreCase("DESC"))
      }.toSeq)
      .getOrElse(Seq.empty)
    val limit = LimitRe.findFirstMatchIn(tail).map(_.group(1).toInt)
    val offset = OffsetRe.findFirstMatchIn(tail).map(_.group(1).toInt)
    // HAVING( expr ): the FULL filter expression grammar over the
    // projected aggregate aliases — boolean composition, arithmetic,
    // string predicates, all of it
    val (having, tailSansHaving) = extractParenClauses(tail, "HAVING", um, parseFilterExpr)
    val leftover =
      OffsetRe.replaceAllIn(LimitRe.replaceAllIn(
        OrderByRe.replaceAllIn(GroupByRe.replaceAllIn(tailSansHaving, " "), " "), " "), " ").trim
    require(leftover.isEmpty, s"unrecognized text after WHERE block: '$leftover'")

    val aggs = projs.collect { case a: ProjAgg => a }
    val plainVars = projs.collect { case ProjVar(n) => n }
    val exprProjs = projs.collect { case e: ProjExpr => e }
    val projected =
      if (aggs.nonEmpty || groupVars.nonEmpty) {
        require(aggs.nonEmpty,
          "GROUP BY requires at least one aggregate projection in SELECT")
        require(exprProjs.isEmpty,
          "expression projections cannot mix with aggregates — BIND the " +
            "expression in the body instead")
        val keys = if (groupVars.nonEmpty) groupVars else plainVars
        val stray = plainVars.filterNot(keys.contains)
        require(stray.isEmpty,
          s"non-aggregated projection(s) ${stray.mkString(", ")} must appear in GROUP BY")
        val aggCols = aggs.map { a =>
          val c = a.exprArg match {
            case Some(e) =>
              // expression aggregate: the inner expression's own typing
              // applies (arithmetic is double; string funcs are string)
              a.func match {
                case "SUM" => sum(e.column.cast("double"))
                case "AVG" => avg(e.column.cast("double"))
                case "MIN" => min(e.column)
                case "MAX" => max(e.column)
                case other => throw new IllegalArgumentException(
                  s"$other does not take an expression argument")
              }
            case None => simpleAggColumn(a)
          }
          c.as(a.alias)
        }
        val agged =
          if (keys.isEmpty) bindings.agg(aggCols.head, aggCols.tail: _*)
          else bindings.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        // output columns in the head's declared order
        agged.select(projs.map {
          case ProjVar(n) => col(n)
          case a: ProjAgg => col(a.alias)
        }: _*)
      } else if (projs.nonEmpty) bindings.select(projs.map {
        case ProjVar(n) => col(n)
        case ProjExpr(e, alias) => e.column.as(alias)
        case a: ProjAgg => col(a.alias) // unreachable: aggs handled above
      }: _*)
      else bindings
    require(having.isEmpty || aggs.nonEmpty,
      "HAVING requires an aggregate projection in SELECT")
    val filtered = applyFilters(projected, having)
    val dd = if (distinct) filtered.distinct() else filtered
    val ordered =
      if (orderKeys.isEmpty) dd
      else dd.orderBy(orderKeys.map { case (v, desc) =>
        if (desc) col(v).desc else col(v).asc
      }: _*)
    // SPARQL slice order: OFFSET skips first, LIMIT caps what remains
    val sliced = offset.map(ordered.offset).getOrElse(ordered)
    limit.map(sliced.limit).getOrElse(sliced)
  }

  /** Content of the first brace-balanced `{ … }` block in masked text,
    * plus everything after it. Text before the `{` must be blank.
    */
  private def extractBraceBlock(s: String): (String, String) = {
    val start = s.indexOf('{')
    require(start >= 0, s"expected a '{' block in '${s.trim}'")
    require(s.substring(0, start).trim.isEmpty,
      s"unexpected text before '{': '${s.substring(0, start).trim}'")
    var depth = 0
    var i = start
    while (i < s.length) {
      val c = s(i)
      if (c == '{') depth += 1
      else if (c == '}') {
        depth -= 1
        if (depth == 0) return (s.substring(start + 1, i), s.substring(i + 1))
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced braces in '${s.trim}'")
  }

  /** Split on top-level `UNION` keywords — outside braces, quotes, and
    * `<…>` IRIs. The scanner runs over MASKED text (literals first, then
    * IRI tokens), so a literal containing `UNION`/braces, an IRI like
    * `<urn:rel/union/x>`, or a FILTER comparison `?x < 5` (a bare `<`
    * with no closing `>` in the same token is an operator, never an
    * IRI opener — the round-4 scanner mis-lexed it and swallowed
    * everything to the next `>`) can't confuse it. A keyword only
    * splits at a whitespace/brace boundary on both sides, so a
    * variable `?my_union` stays a variable. Strips each group's outer
    * braces.
    */
  private def splitTopLevelUnion(text: String): Seq[String] = {
    val (litMasked, lits) = maskLiterals(text)
    val (masked, iris) = maskIris(litMasked)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var i = 0
    def boundary(c: Char): Boolean = c.isWhitespace || c == '{' || c == '}'
    while (i < masked.length) {
      val c = masked(i)
      if (depth == 0 && (c == 'U' || c == 'u') &&
          masked.regionMatches(true, i, "UNION", 0, 5) &&
          (i == 0 || boundary(masked(i - 1))) &&
          (i + 5 >= masked.length || boundary(masked(i + 5)))) {
        out += cur.toString; cur.clear(); i += 5
      } else {
        if (c == '{') depth += 1
        else if (c == '}') depth -= 1
        cur += c; i += 1
      }
    }
    out += cur.toString
    // strip braces while still masked (every brace in masked text is
    // structural), THEN restore IRIs and literals. NOTE `strip()`, not
    // `trim`: trim removes every char ≤ U+0020 — including the U+0002
    // mask delimiter of a group-edge IRI token — where strip() removes
    // Unicode whitespace only
    out.toSeq.map(g => unmask(unmaskIris(stripOuterBraces(g.strip()), iris), lits))
  }

  private val MaskChar: Char = 1.toChar // U+0001, cannot appear in query text
  private val MaskRe = ("\"" + MaskChar + "(\\d+)" + MaskChar + "\"").r

  /** Replace every quoted literal with an opaque `"␁idx␁"` token so the
    * block-extraction regexes can't fire on keyword lookalikes INSIDE a
    * literal (`"MINUS { x }"` as an object must stay data, not become an
    * anti-join).
    */
  private def maskLiterals(s: String): (String, IndexedSeq[String]) = {
    val lits = scala.collection.mutable.ArrayBuffer[String]()
    val masked = "\"[^\"]*\"".r.replaceAllIn(s, m => {
      lits += m.matched
      java.util.regex.Matcher.quoteReplacement("\"" + MaskChar + (lits.size - 1) + MaskChar + "\"")
    })
    (masked, lits.toIndexedSeq)
  }

  private def unmask(s: String, lits: IndexedSeq[String]): String =
    MaskRe.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))

  private val IriMaskChar: Char = 2.toChar // U+0002, cannot appear in query text
  private val IriMaskRe = (IriMaskChar + "(\\d+)" + IriMaskChar).r

  /** Replace every `<…>` IRI token with an opaque `␂idx␂` placeholder.
    * Only a `<` with a matching `>` in the SAME whitespace-free token is
    * an IRI — a FILTER operator `<`/`<=` never matches, so it survives
    * as an operator. Run on literal-masked text (a literal may contain
    * `<…>` lookalikes that must stay data).
    */
  private def maskIris(s: String): (String, IndexedSeq[String]) = {
    val iris = scala.collection.mutable.ArrayBuffer[String]()
    val masked = "<[^<>\\s]*>".r.replaceAllIn(s, m => {
      iris += m.matched
      java.util.regex.Matcher.quoteReplacement(IriMaskChar.toString + (iris.size - 1) + IriMaskChar)
    })
    (masked, iris.toIndexedSeq)
  }

  private def unmaskIris(s: String, iris: IndexedSeq[String]): String =
    IriMaskRe.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(iris(m.group(1).toInt)))

  /** Strip `{ … }` when the opening brace closes at the final char. */
  private def stripOuterBraces(s: String): String = {
    if (!(s.startsWith("{") && s.endsWith("}"))) return s
    var depth = 0
    var inQuote = false
    var i = 0
    while (i < s.length - 1) {
      val c = s(i)
      if (c == '"') inQuote = !inQuote
      else if (!inQuote && c == '{') depth += 1
      else if (!inQuote && c == '}') { depth -= 1; if (depth == 0) return s }
      i += 1
    }
    s.drop(1).dropRight(1)
  }

  private val NotExistsRe = """(?i)FILTER\s+NOT\s+EXISTS\s*\{([^{}]*)\}""".r
  private val ExistsRe = """(?i)FILTER\s+EXISTS\s*\{([^{}]*)\}""".r
  private val DtFuncRe =
    """(?i)\b(?:DATATYPE|LANGMATCHES|LANG|isIRI|isLiteral|isBlank|isNumeric)\s*\(""".r

  /** Extract top-level `{ SELECT … }` sub-select blocks from masked
    * text: each is compiled by a recursive [[select]] call and joined
    * into the branch on its shared variables — SPARQL 1.1 subqueries.
    * A sub-select directly inside OPTIONAL/MINUS/GRAPH/VALUES/EXISTS is
    * rejected loudly (not silently mis-scoped).
    */
  private def extractSubqueries(s: String): (Seq[String], String) = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder(s)
    var i = 0
    while (i < s.length) {
      if (s(i) == '{') {
        var depth = 0
        var j = i
        var endIdx = -1
        while (j < s.length && endIdx < 0) {
          if (s(j) == '{') depth += 1
          else if (s(j) == '}') { depth -= 1; if (depth == 0) endIdx = j }
          j += 1
        }
        require(endIdx >= 0, s"unbalanced braces in '$s'")
        val inner = s.substring(i + 1, endIdx)
        if (inner.trim.toUpperCase.startsWith("SELECT")) {
          val before = s.substring(0, i).trim
          val words = before.split("\\s+").filter(_.nonEmpty)
          val last = words.lastOption.getOrElse("").toUpperCase
          val secondLast = if (words.length >= 2) words(words.length - 2).toUpperCase else ""
          require(!Set("OPTIONAL", "MINUS", "EXISTS", "VALUES", "GRAPH").contains(last)
              && secondLast != "GRAPH",
            s"a sub-select inside $last { … } is not supported — join it at the group level")
          out += inner
          for (k <- i to endIdx) sb.setCharAt(k, ' ')
        }
        i = endIdx + 1
      } else i += 1
    }
    (out.toSeq, sb.toString)
  }

  /** One UNION branch: sub-selects and EXISTS / NOT EXISTS blocks out
    * first, then OPTIONAL and MINUS blocks (so their FILTERs stay
    * inside), then GRAPH blocks, then BINDs and group-level FILTERs,
    * then the remaining required patterns; compile base join →
    * inner-join subqueries → left-join optionals → anti-join minus
    * groups → semi-join EXISTS → anti-join NOT EXISTS → VALUES →
    * BIND columns → apply filters. (BIND applies after the group's
    * joins and before its FILTERs — a filter can reference a bound
    * alias; a BIND referencing a variable from a LATER pattern in the
    * same group works too, a deliberate simplification of SPARQL's
    * position-sensitive BIND scope.)
    */
  private def compileGroup(rawQuads: DataFrame, group: String,
                           dataset: Option[Dataset] = None,
                           forceTrackDt: Boolean = false): DataFrame = {
    // a branch that IS a bare sub-select (its braces were stripped by
    // the UNION splitter) re-enters select() whole — patterns can never
    // start with the SELECT keyword, so the dispatch is unambiguous.
    // The full-head match (not just the keyword) keeps a malformed
    // 'SELECT' without WHERE out of an infinite select() recursion.
    if (SelectHeadRe.pattern.matcher(maskLiterals(group)._1).matches())
      return select(rawQuads, group)
    // literal AND IRI masking: the block-extraction regexes must never
    // fire on keyword lookalikes INSIDE a quoted literal ("MINUS { x }"
    // as an object is data) or inside an IRI (<urn:x/FILTER(y)> is a
    // term, not a clause); every extracted sub-block is unmasked before
    // its own parse
    val (litMasked, lits) = maskLiterals(group)
    val (maskedGroup, iris) = maskIris(litMasked)
    def um(x: String): String = unmask(unmaskIris(x, iris), lits)
    val (subqueries, gsub) = extractSubqueries(maskedGroup)
    // dataset scoping (FROM / FROM NAMED): the default-graph side feeds
    // every non-GRAPH pattern and sub-block; the named side feeds GRAPH
    // blocks. Per SPARQL, a dataset clause is a complete specification —
    // an absent FROM NAMED empties the GRAPH side (isin of an empty
    // list is false). Sub-selects currently re-enter against the FULL
    // quad table — a documented deviation (SPARQL scopes the dataset
    // over subqueries too).
    val defaultBase = dataset match {
      case Some(d) => rawQuads.filter(col("graph").isin(d.defaults: _*))
      case None => rawQuads
    }
    val namedBase = dataset match {
      case Some(d) => rawQuads.filter(col("graph").isin(d.named: _*))
      case None => rawQuads
    }
    // bridge path closures for THIS branch only (sub-selects re-enter
    // select() against the raw quads and bridge their own paths —
    // bridging the raw table once per scope keeps the virtual closure
    // triples single-counted)
    val quads = bridgePaths(defaultBase, um(gsub))
    // datatype tracking is opt-in per branch: only when a filter in this
    // branch (incl. its OPTIONAL/MINUS/EXISTS blocks) introspects terms
    // do object variables carry their v__dt companion columns
    val trackDt = forceTrackDt || DtFuncRe.findFirstIn(gsub).isDefined
    val notExistsGroups = NotExistsRe.findAllMatchIn(gsub).map(m => um(m.group(1))).toSeq
    val gne = NotExistsRe.replaceAllIn(gsub, " ")
    val existsGroups = ExistsRe.findAllMatchIn(gne).map(m => um(m.group(1))).toSeq
    val gex = ExistsRe.replaceAllIn(gne, " ")
    val optionals = OptionalRe.findAllMatchIn(gex).map(m => um(m.group(1))).toSeq
    val gv = OptionalRe.replaceAllIn(gex, " ")
    def valuesConst(t: String): String =
      if (t.startsWith("<") || t.startsWith("\""))
        parseTerm(t) match {
          case Const(v) => v
          case other => throw new IllegalArgumentException(
            s"VALUES entries must be constants, got $other")
        }
      else throw new IllegalArgumentException(s"unrecognized VALUES entry '$t'")
    // multi-variable form first: its `VALUES (?a ?b) { … }` head would
    // otherwise never match the single-var regex, but extract-and-blank
    // ordering keeps the two scans independent either way
    val valuesMultiBlocks = ValuesMultiRe.findAllMatchIn(gv).map { m =>
      val vars = """\?(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      val rows = """\(([^()]*)\)""".r.findAllMatchIn(um(m.group(2))).map { rm =>
        """"[^"]*"|\S+""".r.findAllIn(rm.group(1)).toSeq.map(valuesConst)
      }.toSeq
      (vars, rows)
    }.toSeq
    val gvm = ValuesMultiRe.replaceAllIn(gv, " ")
    val valuesBlocks = ValuesRe.findAllMatchIn(gvm).map { m =>
      val vals = """"[^"]*"|\S+""".r.findAllIn(um(m.group(2))).toSeq.map(valuesConst)
      (m.group(1), vals)
    }.toSeq
    val g0 = ValuesRe.replaceAllIn(gvm, " ")
    val minusGroups = MinusRe.findAllMatchIn(g0).map(m => um(m.group(1))).toSeq
    val g1 = MinusRe.replaceAllIn(g0, " ")
    val graphBlocks = GraphBlockRe.findAllMatchIn(g1)
      .map(m => (parseTerm(um(m.group(1))), um(m.group(2)))).toSeq
    val g2 = GraphBlockRe.replaceAllIn(g1, " ")
    val (binds, g2b) = extractBinds(g2, um)
    val (filters, g3) = extractFilters(g2b, um)
    val required = um(g3).trim match {
      case "" => Seq.empty[TriplePattern]
      case rest => parsePatterns(rest)
    }
    val plainPatterns = required.map(p => (Option.empty[Term], p))
    val graphPatterns = graphBlocks.flatMap { case (gt, block) =>
      parsePatterns(block).map(p => (Some(gt): Option[Term], p))
    }
    val mixed = plainPatterns ++ graphPatterns
    val subFrames = subqueries.map(sq => select(rawQuads, um(sq)))
    def joinShared(acc: DataFrame, next: DataFrame, what: String): DataFrame = {
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq.sorted
      require(shared.nonEmpty, s"$what shares no variable with its branch")
      acc.join(next, shared)
    }
    require(mixed.nonEmpty || subFrames.nonEmpty,
      s"UNION branch has no patterns: '$group'")
    // without a dataset clause, plain and GRAPH patterns compile over
    // ONE frame (a plain pattern matches quads in any graph); with one,
    // the two groups compile over their dataset sides and join on
    // shared variables
    val patternBase: Option[DataFrame] =
      if (mixed.isEmpty) None
      else if (dataset.isEmpty) Some(bgpMixed(quads, mixed, trackDt))
      else {
        val parts =
          (if (plainPatterns.nonEmpty) Seq(bgpMixed(quads, plainPatterns, trackDt)) else Nil) ++
            (if (graphPatterns.nonEmpty) Seq(bgpMixed(namedBase, graphPatterns, trackDt)) else Nil)
        Some(parts.reduce { (a, b) =>
          val shared = a.columns.toSet.intersect(b.columns.toSet).toSeq.sorted
          if (shared.isEmpty) a.crossJoin(b) else a.join(b, shared)
        })
      }
    val base = patternBase match {
      case Some(pb) => subFrames.foldLeft(pb)(joinShared(_, _, "sub-select"))
      case None => subFrames.reduce(joinShared(_, _, "sub-select"))
    }
    val withOptionals = optionals.foldLeft(base) { (acc, ob) =>
      val q = parseQuery(ob)
      val opt = applyFilters(bgp(quads, q.patterns, trackDt), q.filters)
      val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"OPTIONAL group '$ob' shares no variable with its branch")
      acc.join(opt, shared, "left_outer")
    }
    val withMinus = minusGroups.foldLeft(withOptionals) { (acc, mb) =>
      val q = parseQuery(mb)
      val m = applyFilters(bgp(quads, q.patterns, trackDt), q.filters)
      val shared = acc.columns.toSet.intersect(m.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"MINUS group '$mb' shares no variable with its branch")
      acc.join(m, shared, "left_anti")
    }
    val withExists = existsGroups.foldLeft(withMinus) { (acc, eb) =>
      val q = parseQuery(eb)
      val e = applyFilters(bgp(quads, q.patterns, trackDt), q.filters)
      val shared = acc.columns.toSet.intersect(e.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"FILTER EXISTS group '$eb' shares no variable with its branch")
      acc.join(e, shared, "left_semi")
    }
    val withNotExists = notExistsGroups.foldLeft(withExists) { (acc, nb) =>
      val q = parseQuery(nb)
      val n = applyFilters(bgp(quads, q.patterns, trackDt), q.filters)
      val shared = acc.columns.toSet.intersect(n.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"FILTER NOT EXISTS group '$nb' shares no variable with its branch")
      acc.join(n, shared, "left_anti")
    }
    val withValues1 = valuesBlocks.foldLeft(withNotExists) { case (acc, (v, vals)) =>
      bgpValues(acc, v, vals)
    }
    val withValues = valuesMultiBlocks.foldLeft(withValues1) { case (acc, (vs, rows)) =>
      bgpValuesMulti(acc, vs, rows)
    }
    val withBinds = binds.foldLeft(withValues) { (acc, b) =>
      require(!acc.columns.contains(b.alias),
        s"BIND alias ?${b.alias} is already bound in this branch")
      val bound = acc.withColumn(b.alias, b.expr.column)
      // STRDT/STRLANG construct a term with a datatype / language tag:
      // publish it on the alias's __dt companion so DATATYPE/LANG/
      // LANGMATCHES introspect the constructed term like any other
      // (dropped downstream unless the query tracks datatypes)
      b.expr match {
        case VEStrDt(_, dt) => bound.withColumn(b.alias + DtSuffix, lit(dt))
        case VEStrLang(_, tag) => bound.withColumn(b.alias + DtSuffix, lit("@" + tag))
        case _ => bound
      }
    }
    applyFilters(withBinds, filters)
  }

  /** SPARQL UNION over pattern groups: each group compiles independently
    * via [[bgp]] and the solution sets union by variable NAME — a variable
    * bound in one branch but not another is null (unbound) in the rows
    * from the branch that lacks it, exactly UNION's disjoint-binding
    * semantics. Bag semantics (no dedup), as in SPARQL; wrap in
    * `.distinct()` for DISTINCT.
    */
  def bgpUnion(quads: DataFrame, groups: Seq[Seq[TriplePattern]]): DataFrame = {
    require(groups.nonEmpty, "empty UNION")
    groups.map(g => bgp(quads, g))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** SPARQL CONSTRUCT core: instantiate each `template` pattern once per
    * solution row of `bindings` (a [[bgp]] result) and union into one RDF
    * graph with set semantics (`distinct` — constructed graphs never hold
    * duplicate triples). Variables take the binding's value, constants
    * pass through. Output columns (subj, pred, obj); datatype bookkeeping
    * is the caller's concern when templates construct literals.
    */
  def construct(bindings: DataFrame, template: Seq[TriplePattern]): DataFrame = {
    require(template.nonEmpty, "empty CONSTRUCT template")
    def c(t: Term): Column = t match {
      case Var(n) => col(n)
      case Const(v) => lit(v)
      case other => throw new IllegalArgumentException(
        s"a CONSTRUCT template term must be a variable or constant, got $other")
    }
    template.map(p =>
        bindings.select(c(p.s).as("subj"), c(p.p).as("pred"), c(p.o).as("obj")))
      .reduce(_.unionByName(_))
      .distinct()
  }

  /** [[bgp]] over a QUAD table (subj, pred, obj, graph): each pattern
    * carries a graph term — SPARQL's `GRAPH ?g { … }` / `GRAPH <iri> { … }`.
    * A `Const("")` graph term selects the default graph (this engine's
    * pipeline convention); a graph VARIABLE binds per-quad and joins like
    * any other variable. Compilation is identical to [[bgp]] with a
    * fourth term column.
    */
  def bgpQuads(quads: DataFrame, patterns: Seq[(Term, TriplePattern)]): DataFrame = {
    require(patterns.nonEmpty, "empty quad pattern")
    compilePatterns(quads, patterns.map { case (g, p) =>
      Seq("subj" -> p.s, "pred" -> p.p, "obj" -> p.o, "graph" -> g)
    })
  }

  /** SPARQL ASK: does the pattern match at all? One row, one boolean
    * column `matched`. A LAZY plan like every other operator here — a
    * global aggregate over the BGP with a `limit 1` in between, so the
    * scan short-circuits at the first solution and no job runs until the
    * caller acts on the result (round-3 version counted eagerly at
    * construction — surprising for a DataFrame-returning API).
    */
  def ask(quads: DataFrame, patterns: Seq[TriplePattern]): DataFrame =
    bgp(quads, patterns).limit(1)
      .select(lit(1).as("one"))
      .agg((count(col("one")) > 0).as("matched"))

  /** SPARQL DESCRIBE (concise bounded description, symmetric flavor):
    * every triple where the node is the subject, plus every triple
    * pointing AT the node (IRI objects only). Two pushable equality
    * filters unioned — no join.
    */
  def describe(quads: DataFrame, node: String): DataFrame =
    quads.filter(col("subj") === lit(node))
      .unionByName(quads.filter(col("obj") === lit(node) && col("dt") === ""))

  /** [[bgp]] plus SPARQL OPTIONAL semantics: each `optional` pattern
    * group left-outer-joins onto the required bindings on their shared
    * variables — required rows survive unmatched with nulls in the
    * optional-only columns, exactly OPTIONAL's preserve-left contract.
    * Each group must share ≥ 1 variable with the required block (an
    * unanchored OPTIONAL would be a cartesian — rejected, not guessed).
    */
  def bgpOptional(quads: DataFrame, required: Seq[TriplePattern],
                  optional: Seq[Seq[TriplePattern]]): DataFrame =
    optional.foldLeft(bgp(quads, required)) { (acc, group) =>
      val opt = bgp(quads, group)
      val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"OPTIONAL group ${group.mkString(", ")} shares no variable with the required pattern")
      acc.join(opt, shared, "left_outer")
    }

  /** SPARQL MINUS / FILTER NOT EXISTS: remove solutions that have a
    * compatible solution in a minus group — compiled as a LEFT ANTI join
    * on the shared variables (hash anti-join: no row explosion, map-side
    * broadcastable when the minus side is small). The two SPARQL
    * constructs differ only on empty-shared-domain corner cases; this
    * implementation requires ≥ 1 shared variable per group (an
    * unanchored MINUS removes nothing in SPARQL — rejected here as
    * almost certainly a bug, same policy as [[bgpOptional]]).
    */
  def bgpMinus(quads: DataFrame, required: Seq[TriplePattern],
               minus: Seq[Seq[TriplePattern]]): DataFrame =
    minus.foldLeft(bgp(quads, required)) { (acc, group) =>
      val m = bgp(quads, group)
      val shared = acc.columns.toSet.intersect(m.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"MINUS group ${group.mkString(", ")} shares no variable with the required pattern")
      acc.join(m, shared, "left_anti")
    }

  /** PageRank over a directed edge list (`src`, `dst`) — node importance
    * for a constructed KG (which entities matter most in the graph). A
    * FIXED iteration count (not an epsilon test), so the result is a
    * replayable function of the input: the DuckDB oracle re-runs the
    * same iterations as chained CTEs and the gate is value-level.
    *
    * Deterministic across partitionings/retries the same way
    * `trainIvfCentroids` is: the only order-sensitive reduction — the
    * per-target contribution sum and the dangling-mass sum — runs over
    * QUANTIZED micro-unit longs (`floor(x·10¹²)`), so Spark's arbitrary
    * aggregation order cannot perturb low bits. Per iteration: one
    * shuffle join of ranks onto edges (both sides keyed by node/src) and
    * one hash aggregation on dst; ranks are lineage-cut per round. At
    * 10^12 edges each round is the canonical rank-join — co-partition
    * the stored edge table by src and the join degenerates to a local
    * zip, exactly how a production deployment would lay it out.
    *
    * Dangling nodes (no out-edges) redistribute their mass uniformly,
    * the standard correction — rank mass is conserved up to
    * quantization (≤ 10⁻¹² per node per round).
    *
    * Output: (node, rank) for every node incident to an edge.
    */
  def pageRank(edges0: DataFrame, iterations: Int = 3,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val Q = 1e12
    val cached = scala.collection.mutable.Buffer[DataFrame]()
    def keep(df: DataFrame): DataFrame = { df.persist(); cached += df; df }
    val edges = edges0.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank")).localCheckpoint()
    for (i <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("node") === outDeg("src"), "left")
      // dangling mass: quantized BIGINT sum — kept as a 1-row FRAME and
      // cross-joined in, so a round adds NO driver action of its own
      val dangling = withDeg.filter(col("deg").isNull)
        .agg((coalesce(sum(floor(col("rank") * Q).cast("long")), lit(0L)) / Q)
          .as("dm"))
      val perEdge = withDeg.filter(col("deg").isNotNull)
        .select(col("src"), floor(col("rank") / col("deg") * Q).cast("long").as("q"))
      val contrib = edges.join(perEdge, "src")
        .groupBy(col("dst").as("node")).agg(sum(col("q")).as("qs"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("qs"), lit(0L)) / Q + col("dm") / n)).as("rank"))
      // persist (lazy, computed once for the two consumers of the next
      // round) instead of an EAGER per-round localCheckpoint — the whole
      // iteration chain then runs as one pipelined DAG at consumption;
      // a periodic checkpoint still bounds lineage depth for long runs
      ranks = if (i % 5 == 0 && i < iterations) next.localCheckpoint()
              else keep(next)
    }
    // single materialization job + cache release (unpersist discipline)
    materializeAndRelease(ranks, cached.toSeq)
  }

  val OwlSameAs = "http://www.w3.org/2002/07/owl#sameAs"

  /** owl:sameAs entity resolution — the KG-construction step that fuses
    * aliases of one real-world entity into a single node. sameAs edges
    * (`?a <owl:sameAs> ?b`, both ends IRIs) span an equivalence relation,
    * so:
    *
    *  1. connected components over the symmetrized sameAs subgraph by
    *     min-label propagation; each clique's canonical representative is
    *     its lexicographically SMALLEST IRI — deterministic and
    *     engine-independent, which is what makes the whole op
    *     value-gateable against a declarative recursive-CTE oracle;
    *  2. every quad's subject — and IRI object (`dt = ""`; literals whose
    *     lexical form happens to equal an alias IRI are NOT touched — is
    *     rewritten through the (alias → canonical) mapping;
    *  3. the sameAs triples themselves are dropped (their information now
    *     lives in the merged node identity), and rewrites that collide
    *     with triples the graph already holds — or with each other —
    *     collapse to one (set semantics).
    *
    * Scale shape: in a real corpus the sameAs subgraph is a small
    * fraction of the graph (a link-discovery / record-linkage output), so
    * the clique mapping BROADCASTS: the full graph is touched only by
    * broadcast-hash joins — the rewrite pass is map-side — and set-dedup
    * probes the small rewritten slice against the (broadcast) collidable
    * slice of the untouched graph, never a whole-graph `distinct()`.
    * Label-propagation rounds are equi-joins over the alias subgraph
    * alone; labels only ever decrease lexicographically, so "no row
    * changed" (one small join per round) is the fixpoint test. A mapping
    * too big to broadcast (pathological: most nodes are aliases) degrades
    * to shuffle joins with the same plan. Raises on non-convergence
    * rather than returning partially-merged identities.
    */
  def resolveSameAs(quads: DataFrame, sameAsPred: String = OwlSameAs,
                    maxIterations: Int = 20,
                    broadcastCap: Long = 50000000L): DataFrame = {
    val edges = quads
      .filter(col("pred") === sameAsPred && col("dt") === "")
      .select(col("subj").as("a"), col("obj").as("b"))
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var (labels, nAlias) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
      sym.select(col("a").as("id")).distinct()
        .select(col("id"), col("id").as("component")))
    var converged = nAlias == 0
    var i = 0
    while (!converged && i < maxIterations) {
      // the old-label join rides INSIDE the checkpointed round (one
      // `prev` column), and the convergence test — any label changed? —
      // is a boolean column counted DURING the checkpoint
      // materialization: one driver action per round, no separate probe
      val prop = sym.join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("component"))
      val (next, _, nChanged) =
        org.apache.spark.sql.GraftInternal.localCheckpointWithPredCount(
          labels.select(col("id"), col("component")).union(prop)
            .groupBy("id").agg(min("component").as("component"))
            .join(labels.select(col("id"), col("component").as("prev")), Seq("id"))
            .withColumn("__changed", col("component") =!= col("prev")),
          "__changed")
      converged = nChanged == 0
      labels = next.select(col("id"), col("component"))
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"resolveSameAs did not converge in $maxIterations rounds " +
          "(adversarially long sameAs chain?) — raise maxIterations")
    // size gate (r5 review #3): at web scale owl:sameAs alias sets are
    // NOT always vocabulary-sized — hundreds of millions of cross-links
    // force-broadcast would OOM the driver or trip the 8 GB broadcast
    // hard cap. The alias-subgraph node count is already known from the
    // label materialization (no extra job); past the cap every
    // mapping-shaped join degrades to a plain shuffle join with the
    // identical plan semantics (same pattern as schemaClosure's
    // driver-side cap).
    val small = nAlias <= broadcastCap
    def bcast(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val mapping = labels.filter(col("id") =!= col("component"))
    val noSameAs = quads.filter(col("pred") =!= sameAsPred)
    val joined = noSameAs
      .join(bcast(mapping.select(col("id").as("s_alias"),
        col("component").as("s_canon"))), col("subj") === col("s_alias"), "left")
      .join(bcast(mapping.select(col("id").as("o_alias"),
        col("component").as("o_canon"))),
        col("obj") === col("o_alias") && col("dt") === "", "left")
    val untouched = joined
      .filter(col("s_canon").isNull && col("o_canon").isNull)
      .select(col("subj"), col("pred"), col("obj"), col("dt"))
    val rewritten = joined
      .filter(col("s_canon").isNotNull || col("o_canon").isNotNull)
      .select(coalesce(col("s_canon"), col("subj")).as("subj"), col("pred"),
        coalesce(col("o_canon"), col("obj")).as("obj"), col("dt"))
      .distinct()
    // a rewritten triple can only equal an untouched one if the untouched
    // row's subject is canonical, or its IRI object is — both slices are
    // broadcast-join-selectable and small (sized by the alias cliques,
    // not the graph). One scan with two left joins and an OR filter, not
    // a union of two semi-joins: the graph pass behind `untouched` (scan
    // + both mapping joins) is expensive and the union form evaluated it
    // twice, plus a distinct shuffle. canonSet is distinct so each left
    // join matches at most once and no row duplicates — and the anti-join
    // below is multiplicity-insensitive anyway.
    val canonSet = mapping.select(col("component").as("c")).distinct()
    val collidable = untouched
      .join(bcast(canonSet.select(col("c").as("c_s"))),
        col("subj") === col("c_s"), "left")
      .join(bcast(canonSet.select(col("c").as("c_o"))),
        col("obj") === col("c_o") && col("dt") === "", "left")
      .filter(col("c_s").isNotNull || col("c_o").isNotNull)
      .select(col("subj"), col("pred"), col("obj"), col("dt"))
    untouched.union(
      rewritten.join(bcast(collidable),
        Seq("subj", "pred", "obj", "dt"), "left_anti"))
  }

  val RdfsSubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  val RdfsSubPropertyOf = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
  val RdfsDomain = "http://www.w3.org/2000/01/rdf-schema#domain"
  val RdfsRange = "http://www.w3.org/2000/01/rdf-schema#range"

  /** RDFS forward-chaining materialization over the ρdf fragment (the
    * minimal RDFS of Muñoz, Pérez & Gutierrez: subClassOf /
    * subPropertyOf / domain / range / type — the rules that matter for
    * KG construction), stratified so ONE pass reaches the fixpoint:
    *
    *  1. transitive closure of the (tiny) subPropertyOf and subClassOf
    *     schema graphs — [[transitiveClosure]], log-rounds doubling;
    *  2. rdfs7: `(x p y), p ⊑ q ⟹ (x q y)` — instance triples
    *     broadcast-joined against the subPropertyOf closure;
    *  3. rdfs2/rdfs3: domain typing over the rdfs7-EXTENDED triple set
    *     (a domain on a super-property types subjects reached through
    *     derived triples too); range typing only for IRI objects
    *     (`dt = ""` — literals are never typed);
    *  4. rdfs9: `(x type c), c ⊑ d ⟹ (x type d)` over ALL type triples
    *     — asserted, rdfs7-derived (a property may be sub-property OF
    *     rdf:type), and the fresh domain/range ones;
    *  5. derived closure triples (p ⊑⁺ q, c ⊑⁺ d) join the output.
    *
    * This stratification is complete for ρdf because no instance rule
    * derives schema triples — the standard no-meta-schema assumption
    * (a property that is itself sub-property of rdfs:domain etc. is out
    * of fragment, as in ter Horst's pD* treatments).
    *
    * Scale shape: schema graphs are vocabulary-sized (thousands of
    * classes/properties vs billions of instance triples), so EVERY rule
    * is a broadcast-hash join against the instance table — map-side, no
    * instance shuffle. The one shuffle is the final set-dedup: derived
    * triples `distinct()` then anti-join the asserted graph on
    * (subj, pred, obj, dt) — sized by the derived set, and co-shuffle
    * with the stored graph disappears under a (subj,pred,obj)-bucketed
    * layout, the same contract [[resolveSameAs]] and `updateQuery`
    * document. Output: asserted ∪ derived, a set.
    */
  def rdfsMaterialize(quads: DataFrame, maxIterations: Int = 20): DataFrame = {
    // materialize the asserted graph ONCE: the two schema collects, four
    // schema-slice filters, every rule join, and the final anti-join all
    // read it — without the cut each reader re-evaluates the caller's
    // full upstream plan (measured 7.5 s → 2.3 s on the sf0.1 gated
    // query). localCheckpoint, not cache: the lifetime is this call's
    // plan, no unpersist bookkeeping for the caller. At stored-table
    // scale the input IS a materialized table and this is a no-op cost.
    val q4 = quads.select(col("subj"), col("pred"), col("obj"), col("dt"))
      .localCheckpoint()
    def schemaEdges(p: String) = q4
      .filter(col("pred") === p && col("dt") === "")
      .select(col("subj").as("src"), col("obj").as("dst"))
    val spoC = schemaClosure(schemaEdges(RdfsSubPropertyOf), maxIterations)
    val scoC = schemaClosure(schemaEdges(RdfsSubClassOf), maxIterations)
    val dom = q4.filter(col("pred") === RdfsDomain && col("dt") === "")
      .select(col("subj").as("d_p"), col("obj").as("d_c"))
    val rng = q4.filter(col("pred") === RdfsRange && col("dt") === "")
      .select(col("subj").as("r_p"), col("obj").as("r_c"))
    val derived7 = q4.join(broadcast(spoC), col("pred") === col("src"))
      .select(col("subj"), col("dst").as("pred"), col("obj"), col("dt"))
    val ext = q4.unionByName(derived7)
    val t2 = ext.join(broadcast(dom), col("pred") === col("d_p"))
      .select(col("subj"), lit(RdfTypeIri).as("pred"), col("d_c").as("obj"),
        lit("").as("dt"))
    val t3 = ext.filter(col("dt") === "")
      .join(broadcast(rng), col("pred") === col("r_p"))
      .select(col("obj").as("subj"), lit(RdfTypeIri).as("pred"),
        col("r_c").as("obj"), lit("").as("dt"))
    val typesAll = ext.filter(col("pred") === RdfTypeIri)
      .select(col("subj"), col("obj"))
      .unionByName(t2.select(col("subj"), col("obj")))
      .unionByName(t3.select(col("subj"), col("obj")))
    val t9 = typesAll.join(broadcast(scoC), col("obj") === col("src"))
      .select(col("subj"), lit(RdfTypeIri).as("pred"), col("dst").as("obj"),
        lit("").as("dt"))
    val closureTriples = spoC.select(col("src").as("subj"),
        lit(RdfsSubPropertyOf).as("pred"), col("dst").as("obj"), lit("").as("dt"))
      .unionByName(scoC.select(col("src").as("subj"),
        lit(RdfsSubClassOf).as("pred"), col("dst").as("obj"), lit("").as("dt")))
    val derived = derived7.unionByName(t2).unionByName(t3).unionByName(t9)
      .unionByName(closureTriples)
      .distinct()
      .join(q4, Seq("subj", "pred", "obj", "dt"), "left_anti")
    q4.unionByName(derived)
  }

  /** Transitive closure of a SCHEMA graph (subClassOf / subPropertyOf
    * edges): ontologies are vocabulary-sized by definition — thousands
    * of classes against billions of instance triples — so the closure is
    * computed driver-side in one collect (the same tiny-by-contract
    * driver action as the IVF codebook) instead of spending an iterative
    * round of Spark jobs per hop; an unexpectedly huge edge set (over
    * 100k rows) falls back to the distributed [[transitiveClosure]]
    * rather than flooding the driver.
    */
  private def schemaClosure(edges: DataFrame, maxIterations: Int): DataFrame = {
    val cap = 100000
    val local = edges.limit(cap + 1).collect()
    if (local.length > cap) return transitiveClosure(edges, maxIterations)
    val adj = scala.collection.mutable.Map[String, scala.collection.mutable.Set[String]]()
    local.foreach(r =>
      adj.getOrElseUpdate(r.getString(0), scala.collection.mutable.Set()) += r.getString(1))
    val out = scala.collection.mutable.Buffer[(String, String)]()
    for (src <- adj.keys.toSeq.sorted) {
      val seen = scala.collection.mutable.Set[String]()
      var frontier: Set[String] = adj(src).toSet
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(n =>
          adj.get(n).map(_.toSet).getOrElse(Set.empty)).diff(seen)
      }
      seen.foreach(d => out += ((src, d)))
    }
    if (out.isEmpty) edges.limit(0)
    else {
      val sp = edges.sparkSession
      sp.createDataFrame(out.toSeq).toDF("src", "dst")
    }
  }

  /** Per-node triangle counts over an undirected-ized edge list — the
    * clustering-structure profile of a constructed KG (communities,
    * link-farm detection, graph health). The classic degree-ordered
    * orientation (Chiba–Nishizeki / MapReduce "compact-forward"): every
    * edge points from its lower-(degree, id) endpoint to the higher, so
    * each triangle is enumerated EXACTLY once from its minimum corner,
    * and — the 100-TB point — wedge generation fans out from the
    * low-degree side: a star hub of degree d contributes no d² wedge
    * blow-up because its edges all point INTO it. Two shuffles join the
    * wedge set back to the oriented edges; keys are uniform node ids.
    * The orientation only affects enumeration order, never the triangle
    * SET, so an id-oriented declarative replay (the DuckDB oracle)
    * value-gates the result.
    *
    * Output: (node, n_triangles) for EVERY node incident to an edge
    * (zero-triangle nodes included, self-loops dropped, parallel edges
    * collapsed).
    */
  def triangleCount(edges0: DataFrame): DataFrame = {
    val und = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    val nodes = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .distinct()
    val deg = und.select(col("a").as("n")).union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val keyed = und
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = keyed.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, struct(col("db").as("d"), col("b").as("i")))
          .otherwise(struct(col("da").as("d"), col("a").as("i"))).as("kv"))
      .localCheckpoint()
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.kv") < col("e2.kv"))
      .select(col("e1.u").as("t1"), col("e1.v").as("t2"), col("e2.v").as("t3"))
    val tris = wedges.join(
      oriented.select(col("u").as("t2"), col("v").as("t3")), Seq("t2", "t3"))
    val corners = tris.select(col("t1").as("n"))
      .union(tris.select(col("t2").as("n")))
      .union(tris.select(col("t3").as("n")))
      .groupBy("n").agg(count(lit(1)).as("c"))
    nodes.join(corners, Seq("n"), "left")
      .select(col("n").as("node"), coalesce(col("c"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: triangles through the node
    * over the wedges it centers — `2·tri / (deg·(deg−1))` on the
    * undirected simple graph. The coefficient is emitted in INTEGER
    * micro-units (`floor(1e6 · 2 · tri / (deg · (deg − 1)))` via pure
    * BIGINT arithmetic), so the value is bit-identical across engines,
    * partitionings, and retries — same quantization discipline as
    * [[pageRank]]. Cost on top of [[triangleCount]] is one degree
    * aggregation plus one equi-join on the uniform node id; at corpus
    * scale the triangle enumeration dominates and its degree-ordered
    * orientation already bounds the wedge fan-out (see there). Nodes of
    * degree < 2 center no wedge and get coefficient 0 by convention.
    *
    * Output: (node, degree, n_triangles, coeff_micro).
    */
  def clusteringCoefficient(edges0: DataFrame): DataFrame = {
    val und = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    triangleCount(edges0).join(deg, Seq("node"))
      .select(col("node"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2,
            (lit(2000000L) * col("n_triangles")) /
              (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0L)).cast("long").as("coeff_micro"))
  }

  /** k-core decomposition membership: the maximal induced subgraph in
    * which every node has degree ≥ k, found by the standard peeling
    * fixpoint — repeatedly drop nodes whose CURRENT induced degree is
    * below k. Each round is one degree aggregation over the surviving
    * edge set plus two semi-joins restricting edges to surviving
    * endpoints — all keyed on the uniform node id, lineage cut per
    * round. Peeling removes at least one node per non-final round, but
    * in practice converges in a handful of rounds (each round removes
    * the whole current "shell"); `maxIterations` bounds the loop and the
    * method RAISES rather than returning a superset of the core. The
    * k-core is unique (the union of two subgraphs with min-degree ≥ k
    * has min-degree ≥ k), so a declarative unrolled replay — the DuckDB
    * oracle chains the same peel round a fixed number of times; extra
    * rounds past the fixpoint are no-ops — value-gates the result.
    *
    * At 10^12 edges: the edge table shrinks monotonically (each round's
    * semi-joins only ever REMOVE rows), so round cost decays; the
    * convergence test rides the degree aggregate already computed (no
    * extra job). Swap localCheckpoint → reliable checkpoint on a real
    * cluster, as with every iterative op here.
    *
    * Output: (node, core_degree) for k-core members — their degree
    * WITHIN the core (≥ k by construction).
    */
  def kCore(edges0: DataFrame, k: Int, maxIterations: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var und = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint()
    var i = 0
    while (i < maxIterations) {
      // the "any node below k?" probe is counted during the degree
      // checkpoint's own materialization — one action per peeling round
      val (deg, _, nBelow) =
        org.apache.spark.sql.GraftInternal.localCheckpointWithPredCount(
          und.select(col("a").as("node")).union(und.select(col("b").as("node")))
            .groupBy("node").agg(count(lit(1)).as("core_degree"))
            .withColumn("__below", col("core_degree") < k),
          "__below")
      val keep = deg.filter(col("core_degree") >= k)
        .select(col("node"), col("core_degree"))
      if (nBelow == 0) return keep
      und = und
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      i += 1
    }
    throw new IllegalStateException(
      s"kCore(k=$k) did not reach its peeling fixpoint in $maxIterations " +
        "rounds — raise maxIterations")
  }

  /** Semi-supervised label propagation: seed nodes carry fixed labels
    * (CLAMPED — they never change, the standard semi-supervised
    * contract), and for `iterations` synchronous rounds every node
    * adopts the MAJORITY label among its (undirected) neighbors'
    * current labels — ties break on the lexicographically smallest
    * label, nodes with no labeled neighbor keep their previous label
    * (initially null). Everything is integer counts and string
    * comparisons, so the op is deterministic across partitionings and
    * replayable declaratively (the DuckDB oracle unrolls the same
    * rounds with the same argmax ordering). Per round: one equi-join of
    * the symmetrized edge table against the CURRENT labeled set (shrunk
    * to labeled nodes only), one hash-count, one per-node argmax window
    * — all keyed on the uniform node id; lineage cut per round. The
    * entity-classification workhorse over a constructed KG: seed a few
    * typed nodes, let the link structure type the rest.
    *
    * Output: (node, label) for every node incident to an edge; label
    * null where no seed's influence reached within the round budget.
    */
  def labelPropagation(edges0: DataFrame, seeds: DataFrame,
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val edges = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val und = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val nodes = und.select(col("src").as("node")).distinct()
    val seedsFixed = seeds.select(col("node"), col("label").as("seed_label"))
      .localCheckpoint()
    var labels = nodes
      .join(seedsFixed, Seq("node"), "left")
      .select(col("node"), col("seed_label").as("label"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val nb = und.join(
          labels.filter(col("label").isNotNull)
            .select(col("node").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      // majority argmax as TWO hash aggregations instead of a row_number
      // window: min(struct(-count, label)) is exactly "max count, ties to
      // the lexicographically smallest label", and both aggregation
      // levels get map-side partials — no per-node sort task, skew-safe
      // on a hub node's neighbor list (guide §2.5)
      val picked = nb.groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("label"))).as("m"))
        .select(col("node"), col("m.label").as("new_label"))
      labels = labels.join(picked, Seq("node"), "left")
        .join(seedsFixed, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("seed_label"), col("new_label"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** k-hop integer feature propagation — the message-passing primitive
    * GNN data preparation runs at corpus scale (sparse matrix–vector
    * multiply chained k times): each hop every node's feature becomes
    * `own + Σ feature(in-neighbors)` (GCN-with-self-loop shape). Pure
    * BIGINT arithmetic, so the result is exact, partition-invariant,
    * and declaratively replayable — no quantization needed at all. Per
    * hop: one equi-join of the edge table against the current feature
    * vector plus one hash aggregation on the destination — the textbook
    * SpMV-as-relational-rounds; co-partition the stored edge table by
    * `src` and the join side is shuffle-free. Missing features default
    * to 0; with all-ones init, hop h computes the number of ≤h-step
    * in-paths per node (weighted path counting).
    *
    * Output: (node, f) for every node incident to an edge.
    */
  def featurePropagation(edges0: DataFrame, features: DataFrame,
                         hops: Int = 2): DataFrame = {
    require(hops >= 1, s"hops must be >= 1, got $hops")
    val edges = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var f = nodes.join(features.select(col("node"), col("f")), Seq("node"), "left")
      .select(col("node"), coalesce(col("f"), lit(0L)).cast("long").as("f"))
      .localCheckpoint()
    for (_ <- 1 to hops) {
      val msg = edges
        .join(f.select(col("node").as("src"), col("f").as("mf")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("mf")).as("sf"))
      f = f.join(msg, Seq("node"), "left")
        .select(col("node"), (col("f") + coalesce(col("sf"), lit(0L))).as("f"))
        .localCheckpoint()
    }
    f
  }

  /** Deterministic random walks — the node2vec/DeepWalk corpus
    * generator, the step before any graph-embedding training run. At
    * each step the walk at node `cur` moves to the neighbor whose
    * 1-based index (neighbors ordered by destination id) equals
    * `h60(start|wid|step|cur) mod out-degree + 1` — a hash-seeded
    * choice instead of an RNG, so the walk corpus is bit-identical
    * across partitionings, retries, AND engines (the DuckDB oracle
    * replays every step with the same h60 and the same `row_number`
    * neighbor ordering). Dead ends (no out-edges) terminate the walk —
    * shorter walks are emitted, not padded. Per step: one equi-join
    * against the degree table and one against the indexed adjacency,
    * both keyed on the uniform node id; the adjacency is built once
    * (one window over `src`). Walk count fans out via a literal
    * sequence explode — no driver loop over walks.
    *
    * Output: (start, wid, step, node) — every visit, step 0 = start.
    */
  def randomWalks(edges0: DataFrame, starts: DataFrame, walkLen: Int = 3,
                  walksPerNode: Int = 2): DataFrame = {
    require(walkLen >= 1, s"walkLen must be >= 1, got $walkLen")
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    val edges = edges0.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    val adj = edges.select(col("src"), col("dst"), row_number().over(w).as("idx"))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    var state = starts.select(col("node").as("start")).distinct()
      .select(col("start"),
        explode(sequence(lit(1), lit(walksPerNode))).as("wid"))
      .select(col("start"), col("wid"), col("start").as("node"))
    var acc = state.select(col("start"), col("wid"), lit(0).as("step"), col("node"))
    for (step <- 1 to walkLen) {
      val pick = state.join(deg, state("node") === deg("src"))
        .select(col("start"), col("wid"), col("node"),
          (PortableHash.h60(concat_ws("|", col("start"), col("wid"),
            lit(step), col("node"))) % col("deg") + 1).as("pick"))
      state = pick.join(adj,
          pick("node") === adj("src") && pick("pick") === adj("idx"))
        .select(col("start"), col("wid"), col("dst").as("node"))
        .localCheckpoint()
      acc = acc.union(
        state.select(col("start"), col("wid"), lit(step).as("step"), col("node")))
    }
    acc
  }

  /** Skip-gram training pairs from a walk corpus ([[randomWalks]]
    * output): every ordered (center, context) pair of visits within the
    * same walk at step distance 1..window — the co-occurrence multiset
    * word2vec-style embedding training consumes. One self-join keyed on
    * the walk identity (start, wid) with a bounded step-distance
    * predicate (walks are short, so the per-walk blow-up is ≤
    * 2·window·len — a constant factor, not a cartesian), then one hash
    * aggregation into pair counts.
    *
    * Output: (center, context, n_pairs).
    */
  def skipGramPairs(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walks.select(col("start"), col("wid"), col("step"), col("node"))
    val b = a.select(col("start"), col("wid"), col("step").as("bstep"),
      col("node").as("bnode"))
    a.join(b, Seq("start", "wid"))
      .filter(col("step") =!= col("bstep") &&
        abs(col("step") - col("bstep")) <= window)
      .select(col("node").as("center"), col("bnode").as("context"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Materialize `result` in ONE job (eager local checkpoint — the
    * whole iteration chain runs as a single pipelined DAG with each
    * persisted round-intermediate computed exactly once) and then
    * release every cache entry that fed it. Two effects, both from the
    * r5 review: fixed-round iterative ops stop paying an eager
    * checkpoint job per round (guide §1.2 — job count was the dominant
    * cost at bench scale), and persisted frames no longer outlive the
    * operator call (the unpersist discipline: repeated invocations
    * across a 116-query sweep previously accumulated cached blocks
    * until LRU pressure).
    */
  private def materializeAndRelease(result: DataFrame,
                                    cached: Seq[DataFrame]): DataFrame = {
    val out = result.localCheckpoint()
    cached.foreach(df => try df.unpersist(false) catch { case _: Exception => () })
    out
  }

  /** HITS (Kleinberg) hub/authority scores over a directed edge list,
    * fixed `iterations` rounds of the mutual recurrence with L1
    * normalization: `auth ∝ Σ hub(in-neighbors)`, then
    * `hub ∝ Σ auth(out-neighbors)`. Every sum is QUANTIZED — per-node
    * scores truncate to BIGINT twelfth-units before the aggregate, and
    * the L1 total is itself a BIGINT sum — so results are bit-identical
    * across partitionings/retries and replayable declaratively (the
    * DuckDB oracle chains the identical expression tree per round, the
    * [[pageRank]] discipline). Per round: two equi-joins + two hash
    * aggregations on uniform node ids, one broadcast 1-row total each —
    * no driver action inside the loop; lineage is cut per round.
    * Fixed-round semantics (not convergence-tested): HITS is specified
    * here as an N-round operator precisely so two engines can agree on
    * the exact output.
    *
    * Output: (node, hub, auth) for every node incident to an edge,
    * scores L1-normalized within each vector.
    */
  def hits(edges0: DataFrame, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val Q = 1e12
    val edges = edges0.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint()
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    for (i <- 1 to iterations) {
      // auth step: quantize hub, sum into each edge target, L1-normalize.
      // Per-round localCheckpoint instead of the previous persist():
      // r5 flagged the persists as a cache LEAK (never unpersisted,
      // accumulating across the 116-query sweep); checkpointed rounds
      // self-release via the ContextCleaner and keep the AQE-coalesced
      // partitioning, so a 20-iteration run no longer grows the cache.
      val hq = hub.select(col("node"), floor(col("hub") * Q).cast("long").as("q"))
      val aSum = edges.join(hq, edges("src") === hq("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("q")).as("qs"))
      val aTot = aSum.agg(sum(col("qs")).as("tot"))
      auth = nodes.join(aSum, Seq("node"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("node"),
          (coalesce(col("qs"), lit(0L)).cast("double") / col("tot")).as("auth"))
        .localCheckpoint()
      // hub step: quantize auth, sum into each edge source, L1-normalize
      val aq = auth.select(col("node"), floor(col("auth") * Q).cast("long").as("q"))
      val hSum = edges.join(aq, edges("dst") === aq("node"))
        .groupBy(col("src").as("node")).agg(sum(col("q")).as("qs"))
      val hTot = hSum.agg(sum(col("qs")).as("tot"))
      hub = nodes.join(hSum, Seq("node"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          (coalesce(col("qs"), lit(0L)).cast("double") / col("tot")).as("hub"))
        .localCheckpoint()
    }
    hub.join(auth, Seq("node"))
  }

  /** Single-source-set shortest HOP distances by level-synchronous BFS:
    * round d's frontier is exactly the set of nodes first reached at
    * distance d, so no per-node min() is ever needed — a node entering
    * the frontier IS at its shortest distance, and the anti-join against
    * the settled set both deduplicates and terminates. Rounds =
    * eccentricity of the source set; each round is one equi-join of the
    * (shrinking) frontier against the edge table plus one anti-join
    * against the settled table — all keyed on the uniform node id, with
    * lineage cut per round. Converges when the frontier empties; raises
    * if `maxIterations` rounds still have live frontier (disconnected
    * remainder is fine — unreached nodes simply don't appear).
    *
    * At 10^12 edges this is the textbook Pregel-style BFS as relational
    * rounds: co-partition the stored edge table by `src` and the
    * per-round join is shuffle-free on the edge side; the settled table
    * grows monotonically and only ever probes an anti-join. For graphs
    * whose diameter is large AND whose closure is small,
    * [[transitiveClosure]]'s doubling reaches fixpoint in log-rounds
    * instead — BFS wins when the reachable set is wide but shallow,
    * closure when deep but narrow.
    *
    * Output: (node, distance) for every node reachable from `sources`
    * (`node` column), sources themselves at distance 0.
    */
  def shortestPaths(edges0: DataFrame, sources: DataFrame,
                    maxIterations: Int = 30): DataFrame = {
    val edges = edges0.select(col("src"), col("dst")).distinct().localCheckpoint()
    // ONE job per BFS level: the frontier checkpoint's materialization
    // count doubles as the liveness test, and `dist` needs no checkpoint
    // of its own — it is a plain union of the already-materialized
    // frontier frames (guide §1.2: previously 3 jobs per level, and the
    // level count is the tree depth, so this is the whole query's cost)
    var (frontier0, nFrontier) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
      sources.select(col("node")).distinct()
        .select(col("node"), lit(0L).as("distance")))
    var frontier = frontier0
    var dist = frontier
    var i = 0
    var live = nFrontier > 0
    while (live && i < maxIterations) {
      // the level's distance is the loop counter — a driver constant —
      // so it never rides through the join/distinct/anti-join: the
      // frontier shuffles a single node column and the distinct and
      // anti-join share the same key shape
      val (f, nf) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
        frontier.join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node"))
          .distinct()
          .join(dist, Seq("node"), "left_anti")
          .select(col("node"), lit((i + 1).toLong).as("distance")))
      frontier = f
      live = nf > 0
      // the settled table re-materializes every FOURTH level, not every
      // level: in between it is a short union chain of already-
      // materialized frontier frames (narrow — no shuffle), so the
      // per-level O(|settled|) checkpoint copy and its job happen D/4
      // times instead of D. (The two extremes both measured worse: a
      // checkpoint per level pays D full copies; no checkpoint at all
      // re-reads every prior level's RDD in each anti-join build.)
      if (live) {
        val u = dist.union(frontier)
        dist = if (i % 4 == 3) u.localCheckpoint() else u
      }
      i += 1
    }
    if (live)
      throw new IllegalStateException(
        s"shortestPaths frontier still live after $maxIterations rounds " +
          "(eccentricity exceeds the bound) — raise maxIterations")
    dist
  }

  /** Transitive closure of a directed edge list (`src`, `dst`) by
    * iterative doubling: after round i the path set covers all lengths up
    * to 2^i, so a diameter-D graph converges in ⌈log₂ D⌉ + 1 rounds —
    * O(log D) self-joins instead of the O(D) rounds of frontier BFS. This
    * matters at corpus scale: each round is a full shuffle join, and at
    * 10^12 edges ten shuffles vs a thousand is the whole game. Each round
    * is `localCheckpoint`ed to cut lineage (swap for reliable
    * checkpointing on a real cluster). Convergence = path count fixpoint;
    * non-convergence within `maxIterations` raises rather than returning
    * a silently partial closure.
    *
    * Output: all (src, dst) pairs with dst reachable in ≥ 1 step. Beware
    * the closure of a dense graph is quadratic — this is for
    * hierarchy/ancestry-shaped relations (rdfs:subClassOf, parent trees,
    * skos:broader), not social graphs.
    */
  def transitiveClosure(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    // checkpoint+count fused into ONE job per round (the count IS the
    // materialization the checkpoint runs anyway) — guide §1.2: halve
    // the per-round driver actions before tuning anything else
    var (paths, n) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
      edges.select(col("src"), col("dst")).distinct())
    var converged = n == 0
    var i = 0
    while (!converged && i < maxIterations) {
      val doubled = paths.as("l").join(paths.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
      val (next, m) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
        paths.union(doubled).distinct())
      converged = m == n
      paths = next
      n = m
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"transitiveClosure did not converge in $maxIterations doubling rounds " +
          "(cycle-free depth > 2^rounds, or a dense quadratic closure) — raise maxIterations")
    paths
  }

  /** Incrementally maintain a materialized transitive closure: given
    * the closure `C` of an edge set and a batch of NEW edges `ΔE`,
    * compute the closure of the union WITHOUT re-closing the old edge
    * set — [[closureDelta]] (all the join work, sized by the delta)
    * plus a disjoint append. This is the maintenance operation behind
    * the closure-table shape [[withPathClosure]] documents for 100×
    * scale: the nightly ingest appends edges, this folds them in.
    *
    * Output: the UPDATED closure (old ∪ new paths), same (src, dst)
    * schema. Value-gated against the full-recompute recursive-CTE
    * oracle (`kg_closure_delta`); raises on non-convergence like
    * [[transitiveClosure]].
    */
  def updateClosure(closure: DataFrame, newEdges: DataFrame,
                    maxIterations: Int = 20): DataFrame = {
    // skip the defensive checkpoint when the caller hands us a frame
    // that is ALREADY a materialized (src, dst) RDD — e.g. fresh out of
    // [[transitiveClosure]] — re-checkpointing it is a pure O(|closure|)
    // copy job on the biggest frame of the query
    val c =
      if (org.apache.spark.sql.GraftInternal
            .isMaterializedWithColumns(closure, Seq("src", "dst"))) closure
      else closure.select(col("src"), col("dst")).localCheckpoint()
    val fresh = closureDeltaOn(c, newEdges, maxIterations)
    // disjoint by construction (closureDelta anti-joins the stored set),
    // so the merge is a plain append — NOT a whole-closure distinct():
    // at stored-table scale the old closure never reshuffles
    c.union(fresh)
  }

  /** The APPEND HALF of [[updateClosure]] — just the paths the new edges
    * create that the stored closure doesn't already hold. This is the
    * shape a 100-TB deployment actually runs: the closure lives in a
    * partitioned table, the nightly ingest computes this delta and
    * APPENDS it; nothing ever rewrites the stored set. Semi-naive delta
    * iteration, all joins sized by the delta:
    *
    * normalization first — every path with EXACTLY ONE new edge,
    * optionally C-extended on either side (`Δ ∪ CΔ ∪ ΔC ∪ CΔC`).
    * Because C is transitively CLOSED, two adjacent C-segments compose
    * inside C, so any multi-new-edge path decomposes into these
    * segments joined end to end and the loop below needs only the
    * single Δ⋈Δ self-join per round (each round doubles the new-edge
    * count a path may contain: O(log k) rounds for paths through k new
    * edges). The C-joins probe the stored closure with the SMALL side
    * broadcast; the per-round self-join never touches C at all.
    */
  def closureDelta(closure: DataFrame, newEdges: DataFrame,
                   maxIterations: Int = 20): DataFrame =
    closureDeltaOn(
      if (org.apache.spark.sql.GraftInternal
            .isMaterializedWithColumns(closure, Seq("src", "dst"))) closure
      else closure.select(col("src"), col("dst")).localCheckpoint(),
      newEdges, maxIterations)

  /** [[closureDelta]] over an ALREADY-materialized closure frame —
    * [[updateClosure]] checkpoints the stored closure once and both its
    * consumers (the delta joins here and the final append) read that one
    * materialization instead of each paying their own checkpoint job.
    */
  private def closureDeltaOn(c: DataFrame, newEdges: DataFrame,
                             maxIterations: Int): DataFrame = {
    val (edges, nEdges) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
      newEdges.select(col("src"), col("dst")).distinct())
    if (nEdges == 0) return edges // empty frame, right schema
    def chain(l: DataFrame, r: DataFrame): DataFrame =
      l.as("l").join(r.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
    val cEdges = chain(c, edges)
    // checkpoint+count fused per round, same as transitiveClosure
    var (delta, n) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
      edges.union(cEdges).union(chain(edges, c)).union(chain(cEdges, c)).distinct())
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val (next, m) = org.apache.spark.sql.GraftInternal.localCheckpointWithCount(
        delta.union(chain(delta, delta)).distinct())
      converged = m == n
      delta = next
      n = m
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"closureDelta did not converge in $maxIterations delta rounds — raise maxIterations")
    // only genuinely new paths: a new edge may connect a pair the old
    // edges already connected
    delta.join(c, Seq("src", "dst"), "left_anti")
  }

  /** SPARQL property path `p+` (one-or-more): the [[transitiveClosure]]
    * of the constant-predicate edge set — every (subj, obj) pair
    * connected by ≥ 1 hop of `pred` (IRI objects only: literals don't
    * form edges). Output columns (src, dst).
    *
    * NOTE: iterative — materializes the closure when CALLED (the closure
    * loop runs Spark jobs), unlike the lazy single-plan operators here.
    * Same caveat as [[transitiveClosure]]: intended for hierarchy-shaped
    * predicates (rdfs:subClassOf, skos:broader, parent trees), where the
    * closure stays near-linear.
    */
  def pathPlus(quads: DataFrame, pred: String, maxIterations: Int = 20): DataFrame =
    transitiveClosure(
      quads.filter(col("pred") === lit(pred) && col("dt") === "")
        .select(col("subj").as("src"), col("obj").as("dst")),
      maxIterations)

  /** `p*` (zero-or-more): [[pathPlus]] plus the identity pair for every
    * node incident to a `pred` edge — SPARQL's zero-length path over the
    * predicate's domain∪range.
    */
  def pathStar(quads: DataFrame, pred: String, maxIterations: Int = 20): DataFrame = {
    val edges = quads.filter(col("pred") === lit(pred) && col("dt") === "")
      .select(col("subj").as("src"), col("obj").as("dst"))
    val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
    pathPlus(quads, pred, maxIterations)
      .unionByName(nodes.select(col("n").as("src"), col("n").as("dst")))
      .distinct()
  }

  /** Bridge a property path into the BGP compiler: augments the triple
    * table with VIRTUAL triples `(s, "<pred>+", o, "")` for the closure
    * of `pred`, so a pattern can say
    * `TriplePattern(Var("x"), Const(pred + "+"), Var("anc"))` and join
    * like any other pattern. At 100× scale the closure of a stored
    * hierarchy predicate would itself be a materialized (incrementally
    * maintained) table — this constructs exactly that shape.
    */
  def withPathClosure(quads: DataFrame, pred: String, maxIterations: Int = 20): DataFrame =
    quads.unionByName(
      pathPlus(quads, pred, maxIterations).select(
        col("src").as("subj"), lit(pred + "+").as("pred"),
        col("dst").as("obj"), lit("").as("dt")))

  /** [[withPathClosure]] for `p*`: virtual triples `(s, "<pred>*", o, "")`
    * from [[pathStar]] (closure plus the identity pair over the
    * predicate's domain∪range), so a pattern can say
    * `TriplePattern(Var("x"), Const(pred + "*"), Var("anc"))`.
    */
  def withPathStarClosure(quads: DataFrame, pred: String, maxIterations: Int = 20): DataFrame =
    quads.unionByName(
      pathStar(quads, pred, maxIterations).select(
        col("src").as("subj"), lit(pred + "*").as("pred"),
        col("dst").as("obj"), lit("").as("dt")))

  /** Zero-or-one path `p?`: virtual triples `(s, "<pred>?", o, "")` =
    * the predicate's edges plus the identity pair over its domain∪range.
    * Unlike `+`/`*` this needs NO closure iteration — the plan stays
    * lazy (one union + distinct), so `p?` is safe on any predicate, not
    * just hierarchy-shaped ones.
    */
  def withPathOptClosure(quads: DataFrame, pred: String): DataFrame = {
    val edges = quads.filter(col("pred") === lit(pred) && col("dt") === "")
      .select(col("subj").as("src"), col("obj").as("dst"))
    val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
    quads.unionByName(
      edges.unionByName(nodes.select(col("n").as("src"), col("n").as("dst")))
        .distinct()
        .select(col("src").as("subj"), lit(pred + "?").as("pred"),
          col("dst").as("obj"), lit("").as("dt")))
  }

  /** Triple count per predicate — the first profiling query over any
    * freshly constructed KG. One hash aggregation with map-side partials.
    */
  def predicateStats(quads: DataFrame): DataFrame =
    quads.groupBy(col("pred")).agg(count(lit(1)).as("n_triples"))

  /** Per-node out-degree (triples with the node as subject) and in-degree
    * (IRI-object triples pointing at it — literals don't create edges,
    * hence the `dt = ""` filter). Two partial-aggregated counts joined
    * full-outer on the node IRI; at KG scale both sides shuffle once on
    * the same key.
    */
  def degrees(quads: DataFrame): DataFrame = {
    val out = quads.groupBy(col("subj").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = quads.filter(col("dt") === "")
      .groupBy(col("obj").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  // ------------------------------------------------------ SPARQL Update

  /** One parsed triple template slot: the three terms plus the datatype
    * the INSTANTIATED triple carries. Template parsing (unlike
    * [[parseTerm]], which collapses IRIs and literals to the same
    * `Const`) keeps the distinction, because an inserted quad needs its
    * `dt` column: quoted literal → xsd:string (or the explicit
    * `"lex"^^<dt>` type), IRI constant → `""`. A VARIABLE in object
    * position instantiates with `dt = ""` — template variables are
    * assumed IRI-valued (the common rewiring case); reinserting a
    * LITERAL value needs the constant form, and the scaladoc of
    * [[updateQuery]] says so out loud.
    */
  private final case class TripleTmpl(s: Term, p: Term, o: Term, dt: String)

  /** Tokenize + parse a data/template block: triples separated by
    * standalone `.`, each `subj pred obj` with `<iri>`/`?var` subjects,
    * `<iri>`/`a`/`?var` predicates (no path syntax — a closure suffix
    * or sequence in a template is meaningless and rejected loudly), and
    * `<iri>`/`?var`/`"lit"`/`"lex"^^<dt>` objects. The typed-literal
    * token is matched as ONE token (quote + optional `^^<iri>` tail).
    */
  private def parseTemplateBlock(block: String): Seq[TripleTmpl] = {
    val termRe = """"[^"]*"(?:\^\^<[^<>\s]*>|@[A-Za-z][A-Za-z0-9-]*)?|\S+""".r
    val toks = termRe.findAllIn(block).toSeq
    val groups = toks.foldLeft(List(List.empty[String])) { (acc, t) =>
      if (t == ".") List.empty[String] :: acc else (t :: acc.head) :: acc.tail
    }.map(_.reverse).reverse.filter(_.nonEmpty)
    require(groups.nonEmpty, "empty data/template block")
    groups.map { p =>
      require(p.length == 3, s"a data/template triple needs exactly 3 terms: '${p.mkString(" ")}'")
      val s = parseTerm(p(0))
      require(!p(0).startsWith("\""), s"a triple subject cannot be a literal: '${p(0)}'")
      val predTok = if (p(1) == "a") "<" + RdfTypeIri + ">" else p(1)
      require(predTok.startsWith("<") && predTok.endsWith(">") || predTok.startsWith("?"),
        s"a data/template predicate must be <iri>, 'a', or ?var (no paths): '${p(1)}'")
      val pr = parseTerm(predTok)
      val oTok = p(2)
      val LangLit = """(?s)^"(.*)"@([A-Za-z][A-Za-z0-9-]*)$""".r
      val (o, dt) =
        if (oTok.startsWith("\"")) {
          val hat = oTok.indexOf("\"^^<")
          oTok match {
            case _ if hat >= 0 =>
              (Const(oTok.substring(1, hat)), oTok.substring(hat + 4, oTok.length - 1))
            // language-tagged literal: the tag rides the dt slot as
            // "@tag" (mutually exclusive with a datatype per RDF 1.1)
            case LangLit(lex, tag) => (Const(lex), "@" + tag)
            case _ => (parseTerm(oTok), XsdString)
          }
        } else (parseTerm(oTok), "")
      TripleTmpl(s, pr, o, dt)
    }
  }

  /** Constant-only data block (INSERT DATA / DELETE DATA) as a local
    * quad DataFrame — a handful of driver-side rows, broadcast-sized by
    * construction.
    */
  private def dataQuads(spark: SparkSession, block: String): DataFrame = {
    val rows = parseTemplateBlock(block).map { t =>
      (t.s, t.p, t.o) match {
        case (Const(s), Const(p), Const(o)) => (s, p, o, t.dt)
        case _ => throw new IllegalArgumentException(
          s"a DATA block must be variable-free: '$block'")
      }
    }
    spark.createDataFrame(rows).toDF("subj", "pred", "obj", "dt")
  }

  /** Instantiate a template per solution binding — [[construct]] with
    * the `dt` column kept. Template variables must be bound by the WHERE
    * body (checked loudly; an unbound template variable is a query bug,
    * not a null triple).
    */
  private def instantiateQuads(bindings: DataFrame, tmpl: Seq[TripleTmpl]): DataFrame = {
    val bound = bindings.columns.toSet
    def c(t: Term): Column = t match {
      case Var(n) =>
        require(bound.contains(n), s"template variable ?$n is not bound by the WHERE body")
        col(n)
      case Const(v) => lit(v)
      case other => throw new IllegalArgumentException(s"bad template term $other")
    }
    tmpl.map(t => bindings.select(
        c(t.s).as("subj"), c(t.p).as("pred"), c(t.o).as("obj"), lit(t.dt).as("dt")))
      .reduce(_.unionByName(_))
      .distinct()
  }

  /** RDF-set DELETE: drop every quad whose (subj, pred, obj) appears in
    * `del` — `dt` is derived metadata here, not identity. One left-anti
    * hash join; the delete side is the (usually small) probe side, so at
    * stored-graph scale AQE broadcasts it and the big table never
    * shuffles.
    */
  private def deleteQuads(quads: DataFrame, del: DataFrame): DataFrame =
    quads.join(del.select("subj", "pred", "obj").distinct(),
      Seq("subj", "pred", "obj"), "left_anti")

  /** RDF-set INSERT: append the quads of `ins` not already present
    * (same (subj, pred, obj) identity as [[deleteQuads]]). Presence is
    * one left-anti join probing the NEW rows against the stored table —
    * never a distinct() over the whole graph, which would reshuffle
    * 100 TB to add a handful of triples.
    */
  private def insertQuads(quads: DataFrame, ins: DataFrame): DataFrame =
    quads.unionByName(
      ins.distinct().join(quads.select("subj", "pred", "obj"),
        Seq("subj", "pred", "obj"), "left_anti"))

  private val InsertDataRe = """(?is)^\s*INSERT\s+DATA\b(.*)$""".r
  private val DeleteDataRe = """(?is)^\s*DELETE\s+DATA\b(.*)$""".r
  private val DeleteWhereRe = """(?is)^\s*DELETE\s+WHERE\b(.*)$""".r
  private val DeleteHeadRe = """(?is)^\s*DELETE\b(.*)$""".r
  private val InsertHeadRe = """(?is)^\s*INSERT\b(.*)$""".r

  /** SPARQL 1.1 Update over the (subj, pred, obj, dt) quad table —
    * FUNCTIONAL, Spark-style: returns the updated table as a new lazy
    * DataFrame (the input is never mutated; a caller owning a stored
    * graph writes the result back, and a closure-table owner folds the
    * inserted edges in with [[updateClosure]]). Forms:
    *
    *  - `INSERT DATA { triples }` / `DELETE DATA { triples }` —
    *    variable-free blocks; typed literals `"lex"^^<dt>` supported.
    *  - `DELETE WHERE { patterns }` — the pattern block doubles as the
    *    delete template (spec short form).
    *  - `DELETE { tmpl } INSERT { tmpl } WHERE { body }` — either
    *    template optional (at least one); both instantiate against the
    *    SAME pre-update solutions, deletes apply before inserts
    *    (SPARQL §3.1.3), and the body accepts [[select]]'s full pattern
    *    surface (UNION/FILTER/OPTIONAL/MINUS/GRAPH/VALUES/paths).
    *
    * Set semantics throughout: inserting an existing triple is a no-op,
    * matching on (subj, pred, obj) identity — `dt` travels with the
    * triple but does not distinguish it. A template VARIABLE in object
    * position instantiates with `dt = ""` (IRI-valued assumption);
    * insert literal values through constants. PREFIX declarations
    * expand as in [[select]].
    */
  def updateQuery(quads: DataFrame, text0: String): DataFrame = {
    val text = expandPrefixes(text0)
    val (masked, lits) = maskLiterals(text)
    def block(rest: String): (String, String) = {
      val (b, tail) = extractBraceBlock(rest)
      (unmask(b, lits), tail)
    }
    def requireDone(tail: String): Unit =
      require(tail.trim.isEmpty, s"unrecognized text after update: '${tail.trim}'")
    masked match {
      case InsertDataRe(rest) =>
        val (b, tail) = block(rest); requireDone(tail)
        insertQuads(quads, dataQuads(quads.sparkSession, b))
      case DeleteDataRe(rest) =>
        val (b, tail) = block(rest); requireDone(tail)
        deleteQuads(quads, dataQuads(quads.sparkSession, b))
      case DeleteWhereRe(rest) =>
        val (b, tail) = block(rest); requireDone(tail)
        deleteQuads(quads, instantiateQuads(compileBody(quads, b), parseTemplateBlock(b)))
      case DeleteHeadRe(rest) =>
        val (delB, afterDel) = block(rest)
        val (insB, afterTmpl) = afterDel match {
          case InsertHeadRe(r2) =>
            val (b, t) = block(r2); (Some(b), t)
          case other => (None, other)
        }
        val whereB = afterTmpl match {
          case WhereTailRe(r3) =>
            val (b, tail) = block(r3); requireDone(tail); b
          case other => throw new IllegalArgumentException(
            s"expected WHERE after the update template(s): '${other.trim}'")
        }
        val bindings = compileBody(quads, whereB)
        val afterDelete = deleteQuads(quads, instantiateQuads(bindings, parseTemplateBlock(delB)))
        insB.fold(afterDelete)(b =>
          insertQuads(afterDelete, instantiateQuads(bindings, parseTemplateBlock(b))))
      case InsertHeadRe(rest) =>
        val (insB, afterIns) = block(rest)
        val whereB = afterIns match {
          case WhereTailRe(r2) =>
            val (b, tail) = block(r2); requireDone(tail); b
          case other => throw new IllegalArgumentException(
            s"expected WHERE after the INSERT template: '${other.trim}'")
        }
        insertQuads(quads, instantiateQuads(compileBody(quads, whereB), parseTemplateBlock(insB)))
      case _ => throw new IllegalArgumentException(
        s"updateQuery expects INSERT DATA / DELETE DATA / DELETE WHERE / " +
          s"DELETE/INSERT … WHERE, got '${text.trim.take(80)}'")
    }
  }

  private val MgmtCreateRe =
    """(?is)^\s*CREATE\s+(?:SILENT\s+)?GRAPH\s+<([^>]*)>\s*$""".r
  private val MgmtClearRe =
    """(?is)^\s*(?:CLEAR|DROP)\s+(?:SILENT\s+)?(?:GRAPH\s+<([^>]*)>|(DEFAULT)|(NAMED)|(ALL))\s*$""".r
  private val MgmtCopyRe =
    ("""(?is)^\s*(ADD|COPY|MOVE)\s+(?:SILENT\s+)?(?:(?:GRAPH\s+)?<([^>]*)>|(DEFAULT))""" +
      """\s+TO\s+(?:(?:GRAPH\s+)?<([^>]*)>|(DEFAULT))\s*$""").r
  private val WithHeadRe = """(?is)^\s*WITH\s+<([^>]*)>\s*(.*)$""".r
  private val GraphKwRe = """(?i)\bGRAPH\b""".r

  /** Rewrite one named graph through `f` (which sees a plain 4-column
    * triple table), leaving every other graph's rows untouched — the
    * quad-table analog of a per-partition update: at stored-table scale
    * with a graph-partitioned layout this touches ONLY the target
    * graph's files.
    */
  private def mapGraphSlice(quads: DataFrame, g: String)
                           (f: DataFrame => DataFrame): DataFrame =
    quads.filter(col("graph") =!= lit(g)).unionByName(
      f(quads.filter(col("graph") === lit(g)).select("subj", "pred", "obj", "dt"))
        .withColumn("graph", lit(g)))

  /** Split a DATA block body into (graph, tripleText) segments:
    * top-level triples target the default graph (`""`), `GRAPH <g> { … }`
    * blocks target g. Scans literal- AND IRI-masked text, so a literal
    * or IRI containing the word "graph" never derails the split.
    */
  private def splitDataGraphSegments(body: String): Seq[(String, String)] = {
    val (litMasked, lits) = maskLiterals(body)
    val (masked, iris) = maskIris(litMasked)
    def um(x: String): String = unmask(unmaskIris(x, iris), lits)
    val GraphIriHead = ("""(?s)^\s*""" + IriMaskChar + """(\d+)""" + IriMaskChar + """\s*(.*)$""").r
    val segs = scala.collection.mutable.Buffer[(String, String)]()
    var rest = masked
    var done = false
    while (!done) {
      GraphKwRe.findFirstMatchIn(rest) match {
        case None =>
          if (rest.trim.nonEmpty) segs += ("" -> um(rest))
          done = true
        case Some(m) =>
          val before = rest.substring(0, m.start)
          if (before.trim.nonEmpty) segs += ("" -> um(before))
          rest.substring(m.end) match {
            case GraphIriHead(idx, r2) =>
              val g = iris(idx.toInt).stripPrefix("<").stripSuffix(">")
              val (b, tail) = extractBraceBlock(r2)
              segs += (g -> um(b))
              rest = tail
            case other => throw new IllegalArgumentException(
              s"expected GRAPH <iri> { … } in DATA block at: '${um(other).trim.take(60)}'")
          }
      }
    }
    segs.toSeq
  }

  private def applyDataSegments(quads: DataFrame, body: String,
                                insert: Boolean): DataFrame =
    splitDataGraphSegments(body).groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(quads) { case (acc, (g, parts)) =>
        val dq = parts.map(p => dataQuads(quads.sparkSession, p._2))
          .reduce(_.unionByName(_))
        mapGraphSlice(acc, g)(t =>
          if (insert) insertQuads(t, dq) else deleteQuads(t, dq))
      }

  /** SPARQL 1.1 Update over a NAMED-GRAPH quad table (subj, pred, obj,
    * dt, graph) — the default graph is `graph = ""` (this engine's
    * convention throughout). FUNCTIONAL like [[updateQuery]]: returns
    * the updated table, never mutates the input. Forms:
    *
    *  - graph management: `CLEAR`/`DROP` `GRAPH <g> | DEFAULT | NAMED |
    *    ALL` (CLEAR and DROP coincide — this model keeps no empty-graph
    *    bookkeeping, so `CREATE GRAPH <g>` is likewise a no-op, as the
    *    spec's SILENT mode allows); `ADD | COPY | MOVE [GRAPH] <g|DEFAULT>
    *    TO [GRAPH] <g|DEFAULT>` with the spec's semantics (ADD is
    *    set-union via the same probe-small-side insert as updateQuery,
    *    COPY replaces the target, MOVE also clears the source;
    *    same-graph source/target is a no-op).
    *  - `INSERT DATA` / `DELETE DATA` whose block mixes top-level
    *    triples (default graph) and `GRAPH <g> { … }` sub-blocks.
    *  - `WITH <g> DELETE { … } INSERT { … } WHERE { … }` — the whole
    *    update (patterns AND templates) scoped to graph g.
    *  - any plain [[updateQuery]] form — applied to the default graph.
    *
    * Every form rewrites ONLY the targeted graph slice ([[mapGraphSlice]]);
    * untargeted graphs' rows flow through untouched, so a
    * graph-partitioned stored table updates one partition's files.
    */
  def updateQuadsQuery(quads: DataFrame, text0: String): DataFrame = {
    val text = expandPrefixes(text0)
    val (masked, lits) = maskLiterals(text)
    def block(rest: String): (String, String) = {
      val (b, tail) = extractBraceBlock(rest)
      (unmask(b, lits), tail)
    }
    masked match {
      case MgmtCreateRe(_) => quads
      case MgmtClearRe(g, dflt, named, all) =>
        if (all != null) quads.limit(0)
        else if (named != null) quads.filter(col("graph") === lit(""))
        else quads.filter(col("graph") =!= lit(if (dflt != null) "" else g))
      case MgmtCopyRe(op, srcIri, srcDef, dstIri, dstDef) =>
        val src = if (srcDef != null) "" else srcIri
        val dst = if (dstDef != null) "" else dstIri
        if (src == dst) quads
        else {
          val srcRows = quads.filter(col("graph") === lit(src))
            .select("subj", "pred", "obj", "dt")
          op.toUpperCase match {
            case "ADD" => mapGraphSlice(quads, dst)(t => insertQuads(t, srcRows))
            case "COPY" => quads.filter(col("graph") =!= lit(dst))
              .unionByName(srcRows.withColumn("graph", lit(dst)))
            case "MOVE" => quads
              .filter(col("graph") =!= lit(dst) && col("graph") =!= lit(src))
              .unionByName(srcRows.withColumn("graph", lit(dst)))
          }
        }
      case WithHeadRe(g, rest) =>
        mapGraphSlice(quads, g)(slice => updateQuery(slice, unmask(rest, lits)))
      case InsertDataRe(rest) =>
        val (b, tail) = block(rest)
        require(tail.trim.isEmpty, s"unrecognized text after update: '${tail.trim}'")
        applyDataSegments(quads, b, insert = true)
      case DeleteDataRe(rest) =>
        val (b, tail) = block(rest)
        require(tail.trim.isEmpty, s"unrecognized text after update: '${tail.trim}'")
        applyDataSegments(quads, b, insert = false)
      case _ =>
        mapGraphSlice(quads, "")(slice => updateQuery(slice, text))
    }
  }
}
