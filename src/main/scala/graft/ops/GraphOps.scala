package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  def bgp(quads: DataFrame, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    compilePatterns(quads,
      patterns.map(p => Seq("subj" -> p.s, "pred" -> p.p, "obj" -> p.o)))
  }

  /** Shared pattern→join compiler behind [[bgp]] and [[bgpQuads]]: each
    * pattern is a (column, term) list — constants become equality filters,
    * repeated variables become self-equality filters, variables project —
    * and patterns fold into joins on shared variable names.
    */
  private def compilePatterns(quads: DataFrame,
                              patterns: Seq[Seq[(String, Term)]]): DataFrame = {
    def one(terms: Seq[(String, Term)]): DataFrame = {
      val constFilter = terms.collect {
        case (c, Const(v)) => col(c) === lit(v)
        case (c, ConstIn(vs)) => col(c).isin(vs: _*)
      }.reduceOption(_ && _).getOrElse(lit(true))
      val vars = terms.collect { case (c, Var(n)) => (c, n) }
      val eqFilter = vars.groupBy(_._2).values.collect {
        case group if group.size > 1 =>
          group.map(g => col(g._1)).sliding(2).collect { case Seq(a, b) => a === b }
            .reduce(_ && _)
      }.reduceOption(_ && _).getOrElse(lit(true))
      val proj = vars.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (n, group) => col(group.head._1).as(n) }
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
  private def expandPredicate(s: Term, predToken: String, o: Term): Seq[TriplePattern] = {
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

  private val FilterRe =
    """(?i)FILTER\s*\(\s*\?(\w+)\s*(=|!=|<=|>=|<|>)\s*("[^"]*"|[^\s()]+)\s*\)""".r

  /** Pull every `FILTER(?v op const)` clause out of `s` — which may be
    * literal-MASKED text (see `maskLiterals`); `um` restores any masked
    * operand before it is parsed. Returns (filters, remaining text with
    * the clauses blanked).
    */
  private def extractFilters(s: String,
                             um: String => String = identity): (Seq[Constraint], String) = {
    val filters: Seq[Constraint] = FilterRe.findAllMatchIn(s).map { m =>
      val raw = um(m.group(3))
      if (raw.startsWith("?") && raw.length > 1)
        VarCompare(m.group(1), m.group(2), raw.drop(1))
      else if (raw.startsWith("\"") && raw.endsWith("\""))
        VarFilter(m.group(1), m.group(2), Right(raw.drop(1).dropRight(1)))
      else // malformed operand → NumberFormatException, loudly
        VarFilter(m.group(1), m.group(2), Left(raw.toDouble))
    }.toSeq
    (filters, FilterRe.replaceAllIn(s, " "))
  }

  /** [[parsePatterns]] plus SPARQL's most common constraint form:
    * `FILTER(?v op const)` clauses anywhere in the block (numeric or
    * quoted-string operand). Literal-safe: quoted literals are masked
    * first, so an object literal containing `FILTER(...)` stays data.
    * Returns the patterns and the parsed filters; compile with
    * [[bgpFiltered]].
    */
  def parseQuery(block: String): ParsedQuery = {
    val (masked, lits) = maskLiterals(block)
    val (filters, rest) = extractFilters(masked, unmask(_, lits))
    ParsedQuery(parsePatterns(unmask(rest, lits)), filters)
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
  def bgpMixed(quads: DataFrame, patterns: Seq[(Option[Term], TriplePattern)]): DataFrame = {
    require(patterns.nonEmpty, "empty pattern list")
    compilePatterns(quads, patterns.map { case (g, p) =>
      Seq("subj" -> p.s, "pred" -> p.p, "obj" -> p.o) ++ g.map("graph" -> _)
    })
  }

  private val OptionalRe = """(?i)OPTIONAL\s*\{([^{}]*)\}""".r
  private val MinusRe = """(?i)MINUS\s*\{([^{}]*)\}""".r
  private val GraphBlockRe = """(?i)GRAPH\s+(\?\w+|<[^>]+>|"[^"]*")\s*\{([^{}]*)\}""".r
  private val ValuesRe = """(?i)VALUES\s+\?(\w+)\s*\{([^{}]*)\}""".r

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
    * separators; `FILTER(?v op const)`; `OPTIONAL { patterns [FILTERs] }`
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
    * AVG(?v) AS ?alias)` with `GROUP BY ?v …` (SUM/AVG cast the lexical
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
  def select(quads: DataFrame, text: String): DataFrame = {
    val (masked, lits) = maskLiterals(text)
    masked match {
      case SelectHeadRe(head, rest) =>
        val (distinct, projs) = parseProjections(head)
        val (bodyMasked, tailMasked) = extractBraceBlock(rest)
        applyModifiers(compileBody(quads, unmask(bodyMasked, lits)),
          distinct, projs, tailMasked)
      case _ => compileBody(quads, text)
    }
  }

  /** `CONSTRUCT { template } WHERE { body }` through the text grammar —
    * the body accepts everything [[select]]'s pattern surface does
    * (UNION/FILTER/OPTIONAL/MINUS/GRAPH/VALUES/paths), the template is a
    * plain pattern block instantiated per solution via [[construct]]
    * (set semantics: output triples are distinct).
    */
  def constructQuery(quads: DataFrame, text: String): DataFrame = {
    val (masked, lits) = maskLiterals(text)
    val afterKeyword = masked match {
      case ConstructHeadRe(rest) => rest
      case _ => throw new IllegalArgumentException(
        s"constructQuery expects 'CONSTRUCT { … } WHERE { … }', got '$text'")
    }
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

  /** `ASK { body }` through the text grammar: one row, one boolean
    * column `matched`; the body accepts the full pattern surface. Lazy
    * like [[ask]] (short-circuits at the first solution) — unless the
    * body uses `+`/`*` paths, whose bridging is eager.
    */
  def askQuery(quads: DataFrame, text: String): DataFrame = {
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
  def describeQuery(quads: DataFrame, text: String): DataFrame = text.trim match {
    case DescribeHeadRe(iri) => describe(quads, iri)
    case _ => throw new IllegalArgumentException(
      s"describeQuery expects 'DESCRIBE <iri>', got '$text'")
  }

  /** One entry point for every query form — dispatches on the leading
    * keyword: `SELECT …` / bare pattern block → [[select]],
    * `CONSTRUCT …` → [[constructQuery]], `ASK …` → [[askQuery]],
    * `DESCRIBE <iri>` → [[describeQuery]].
    */
  def query(quads: DataFrame, text: String): DataFrame = {
    val (masked, _) = maskLiterals(text)
    if (ConstructHeadRe.pattern.matcher(masked).matches()) constructQuery(quads, text)
    else if (AskHeadRe.pattern.matcher(masked).matches()) askQuery(quads, text)
    else if (DescribeHeadRe.pattern.matcher(text.trim).matches()) describeQuery(quads, text)
    else select(quads, text)
  }

  private val SelectHeadRe = """(?is)^\s*SELECT\b(.*?)\bWHERE\b(.*)$""".r
  private val ConstructHeadRe = """(?is)^\s*CONSTRUCT\b(.*)$""".r
  private val WhereTailRe = """(?is)^\s*WHERE\b(.*)$""".r
  private val AskHeadRe = """(?is)^\s*ASK\b(.*)$""".r
  private val DescribeHeadRe = """(?is)^\s*DESCRIBE\s+<([^<>\s]*)>\s*$""".r

  /** The pattern surface below the optional SELECT head: bridge any
    * `<p>+`/`<p>*` closure predicates, compile the UNION branches, drop
    * the internal sequence-hop columns.
    */
  private def compileBody(quads: DataFrame, body: String): DataFrame = {
    val df = splitTopLevelUnion(body).map(compileGroup(bridgePaths(quads, body), _))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    df.drop(df.columns.filter(_.startsWith(SeqVarPrefix)).toSeq: _*)
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

  /** One SELECT-head projection: a plain variable or an aggregate. */
  sealed private trait Proj
  private final case class ProjVar(name: String) extends Proj
  /** `arg = None` is `COUNT(*)`; `distinctArg` is `COUNT(DISTINCT ?v)`. */
  private final case class ProjAgg(func: String, arg: Option[String],
                                   alias: String,
                                   distinctArg: Boolean = false) extends Proj

  private val AggProjRe =
    """(?i)^\(\s*(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)\s+AS\s+\?(\w+)\s*\)$""".r
  private val GroupByRe = """(?i)\bGROUP\s+BY((?:\s+\?\w+)+)""".r
  private val OrderByRe =
    """(?i)\bORDER\s+BY((?:\s+(?:(?:ASC|DESC)\s*\(\s*\?\w+\s*\)|\?\w+))+)""".r
  private val OrderKeyRe = """(?i)(ASC|DESC)\s*\(\s*\?(\w+)\s*\)|\?(\w+)""".r
  private val LimitRe = """(?i)\bLIMIT\s+(\d+)""".r
  private val OffsetRe = """(?i)\bOFFSET\s+(\d+)""".r
  private val HavingRe =
    """(?i)\bHAVING\s*\(\s*\?(\w+)\s*(=|!=|<=|>=|<|>)\s*("[^"]*"|[^\s()]+)\s*\)""".r
  private val VarRe = """\?(\w+)""".r

  /** Parse the text between SELECT and WHERE: optional DISTINCT, then
    * `*` (or nothing) for all-bindings, else `?var` and
    * `(AGG(…) AS ?alias)` projections in output order.
    */
  private def parseProjections(head: String): (Boolean, Seq[Proj]) = {
    var h = head.trim
    val distinct = h.toUpperCase.startsWith("DISTINCT")
    if (distinct) h = h.substring("DISTINCT".length).trim
    if (h.isEmpty || h == "*") (distinct, Seq.empty)
    else {
      val tokRe = """\((?:[^()]|\([^()]*\))*\)|\S+""".r
      val projs = tokRe.findAllIn(h).map {
        case AggProjRe(func, dist, arg, alias) =>
          val f = func.toUpperCase
          if (dist != null) require(f == "COUNT",
            s"DISTINCT inside an aggregate is supported for COUNT only, got $f")
          ProjAgg(f, if (arg == "*") None else Some(arg.drop(1)), alias,
            distinctArg = dist != null)
        case t if VarRe.pattern.matcher(t).matches() => ProjVar(t.drop(1))
        case t => throw new IllegalArgumentException(
          s"unrecognized SELECT projection '$t'")
      }.toSeq
      (distinct, projs)
    }
  }

  /** Compile the tail modifiers onto the solution bindings: aggregate /
    * group, project, DISTINCT, ORDER BY, LIMIT — in SPARQL's evaluation
    * order. Raises on unrecognized trailing text.
    */
  private def applyModifiers(bindings: DataFrame, distinct: Boolean,
                             projs: Seq[Proj], tail: String): DataFrame = {
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
    // HAVING(?alias op const): a post-aggregation VarFilter over the
    // projected aggregate aliases (numeric or quoted-string operand)
    val having = HavingRe.findAllMatchIn(tail).map { m =>
      val raw = m.group(3)
      val operand =
        if (raw.startsWith("\"") && raw.endsWith("\"")) Right(raw.drop(1).dropRight(1))
        else Left(raw.toDouble)
      VarFilter(m.group(1), m.group(2), operand)
    }.toSeq
    val leftover =
      HavingRe.replaceAllIn(OffsetRe.replaceAllIn(LimitRe.replaceAllIn(
        OrderByRe.replaceAllIn(GroupByRe.replaceAllIn(tail, " "), " "), " "), " "), " ").trim
    require(leftover.isEmpty, s"unrecognized text after WHERE block: '$leftover'")

    val aggs = projs.collect { case a: ProjAgg => a }
    val plainVars = projs.collect { case ProjVar(n) => n }
    val projected =
      if (aggs.nonEmpty || groupVars.nonEmpty) {
        require(aggs.nonEmpty,
          "GROUP BY requires at least one aggregate projection in SELECT")
        val keys = if (groupVars.nonEmpty) groupVars else plainVars
        val stray = plainVars.filterNot(keys.contains)
        require(stray.isEmpty,
          s"non-aggregated projection(s) ${stray.mkString(", ")} must appear in GROUP BY")
        val aggCols = aggs.map { a =>
          val c = a.func match {
            case "COUNT" if a.distinctArg =>
              countDistinct(col(a.arg.getOrElse(
                throw new IllegalArgumentException("COUNT(DISTINCT) needs a ?variable"))))
            case "COUNT" => a.arg.map(v => count(col(v))).getOrElse(count(lit(1)))
            case "SUM" => sum(col(a.arg.getOrElse(
              throw new IllegalArgumentException("SUM needs a ?variable"))).cast("double"))
            case "AVG" => avg(col(a.arg.getOrElse(
              throw new IllegalArgumentException("AVG needs a ?variable"))).cast("double"))
            case "MIN" => min(col(a.arg.getOrElse(
              throw new IllegalArgumentException("MIN needs a ?variable"))))
            case "MAX" => max(col(a.arg.getOrElse(
              throw new IllegalArgumentException("MAX needs a ?variable"))))
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
      } else if (plainVars.nonEmpty) bindings.select(plainVars.map(col): _*)
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

  /** One UNION branch: OPTIONAL and MINUS blocks out first (so their
    * FILTERs stay inside), then GRAPH blocks, then group-level FILTERs,
    * then the remaining required patterns; compile base join → left-join
    * optionals → anti-join minus groups → apply filters.
    */
  private def compileGroup(quads: DataFrame, group: String): DataFrame = {
    // literal masking: the block-extraction regexes must never fire on
    // keyword lookalikes INSIDE a quoted literal ("MINUS { x }" as an
    // object is data); every extracted sub-block is unmasked before its
    // own parse
    val (maskedGroup, lits) = maskLiterals(group)
    def um(x: String): String = unmask(x, lits)
    val optionals = OptionalRe.findAllMatchIn(maskedGroup).map(m => um(m.group(1))).toSeq
    val gv = OptionalRe.replaceAllIn(maskedGroup, " ")
    val valuesBlocks = ValuesRe.findAllMatchIn(gv).map { m =>
      val vals = """"[^"]*"|\S+""".r.findAllIn(um(m.group(2))).toSeq.map {
        case t if t.startsWith("<") || t.startsWith("\"") =>
          parseTerm(t) match { case Const(v) => v; case other =>
            throw new IllegalArgumentException(s"VALUES entries must be constants, got $other") }
        case t => throw new IllegalArgumentException(s"unrecognized VALUES entry '$t'")
      }
      (m.group(1), vals)
    }.toSeq
    val g0 = ValuesRe.replaceAllIn(gv, " ")
    val minusGroups = MinusRe.findAllMatchIn(g0).map(m => um(m.group(1))).toSeq
    val g1 = MinusRe.replaceAllIn(g0, " ")
    val graphBlocks = GraphBlockRe.findAllMatchIn(g1)
      .map(m => (parseTerm(um(m.group(1))), um(m.group(2)))).toSeq
    val g2 = GraphBlockRe.replaceAllIn(g1, " ")
    val (filters, g3) = extractFilters(g2, um)
    val required = um(g3).trim match {
      case "" => Seq.empty[TriplePattern]
      case rest => parsePatterns(rest)
    }
    val mixed = required.map(p => (Option.empty[Term], p)) ++
      graphBlocks.flatMap { case (gt, block) =>
        parsePatterns(block).map(p => (Some(gt): Option[Term], p))
      }
    require(mixed.nonEmpty, s"UNION branch has no patterns: '$group'")
    val base = bgpMixed(quads, mixed)
    val withOptionals = optionals.foldLeft(base) { (acc, ob) =>
      val q = parseQuery(ob)
      val opt = applyFilters(bgp(quads, q.patterns), q.filters)
      val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"OPTIONAL group '$ob' shares no variable with its branch")
      acc.join(opt, shared, "left_outer")
    }
    val withMinus = minusGroups.foldLeft(withOptionals) { (acc, mb) =>
      val q = parseQuery(mb)
      val m = applyFilters(bgp(quads, q.patterns), q.filters)
      val shared = acc.columns.toSet.intersect(m.columns.toSet).toSeq.sorted
      require(shared.nonEmpty,
        s"MINUS group '$mb' shares no variable with its branch")
      acc.join(m, shared, "left_anti")
    }
    val withValues = valuesBlocks.foldLeft(withMinus) { case (acc, (v, vals)) =>
      bgpValues(acc, v, vals)
    }
    applyFilters(withValues, filters)
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
    var paths = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var n = paths.count()
    var converged = n == 0
    var i = 0
    while (!converged && i < maxIterations) {
      val doubled = paths.as("l").join(paths.as("r"), col("l.dst") === col("r.src"))
        .select(col("l.src").as("src"), col("r.dst").as("dst"))
      val next = paths.union(doubled).distinct().localCheckpoint()
      val m = next.count()
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
}
