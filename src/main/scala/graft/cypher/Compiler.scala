package graft.cypher

import graft.graph.PropertyGraph
import graft.functions.GeomWkt
import graft.gvalue._
import Ast._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** Cypher clause-chain → DataFrame compiler.
  *
  * Mirrors the reference's analysis model — each clause is transformed with the
  * previous clause's result as its input relation
  * (/root/reference/src/backend/parser/cypher_clause.c:157-250, the
  * "previous clause as subquery RTE" pattern) — but here that becomes literal
  * DataFrame chaining, and Catalyst optimizes the whole chain as one plan.
  *
  * Variable layout: every bound entity variable `v` is a set of flat columns
  * `v__id`, `v__label`, `v__<prop>` (edges add `v__start`, `v__end`); scalar
  * variables are plain columns. Flat typed columns (not structs/maps) keep
  * predicates pushdown-able and whole-stage-codegen-friendly — the scale
  * decision that replaces the reference's dynamic gtype row format.
  *
  * Pattern joins are the reference's equi-join quals
  * (make_path_join_quals, cypher_clause.c:3443-3520): a.id = e.start_id AND
  * e.end_id = b.id, direction deciding start/end; undirected edges become a
  * union of both orientations (keeps equi-join → hash join at scale).
  */
final class Compiler(graph: PropertyGraph, val params: Map[String, GValue] = Map.empty) {

  private val spark: SparkSession = graph.spark
  import Compiler._

  private var anonCounter = 0
  private def freshAlias(): String = { anonCounter += 1; s"_anon$anonCounter" }

  /** Does any label store a user property whose name collides with the
    * entity shell field `k` (escaped storage — PropNames)? Gates the
    * shell-field shortcuts: with such a property present, `.id`/`.label`
    * access on entity VALUES must resolve through the properties map.
    */
  private def hasEscapedProp(k: String): Boolean = {
    val ek = PropNames.esc(k)
    ek != k && (graph.vertexLabels.values ++ graph.edgeLabels.values)
      .exists(_.columns.contains(ek))
  }

  def run(query: String): DataFrame = compileQuery(Parser.parse(query))

  def compileQuery(q: Query): DataFrame = q match {
    case SingleQuery(clauses) =>
      finish(clauses.foldLeft(Ctx.empty)(compileClause))
    case SetOp(op, all, l, r) =>
      var ld = compileQuery(l)
      var rd = compileQuery(r)
      // gtype is ONE type in the reference, so `RETURN [1,2,3] UNION
      // RETURN 1` is valid (cypher_setop.sql:57) — where the two sides'
      // Spark types disagree, re-encode BOTH columns through the dynamic
      // codec; columns with no dynamic form (entities) keep their types
      // and surface the same incompatibility the reference reports.
      if (ld.columns.length == rd.columns.length) {
        import graft.gvalue.GValueCol
        val widened = ld.schema.fields.zip(rd.schema.fields).map {
          case (a, b) if a.dataType == b.dataType => None
          case (a, b) =>
            (GValueCol.dynCoerce(col(a.name), a.dataType),
              GValueCol.dynCoerce(col(b.name), b.dataType)) match {
              case (Some(lc), Some(rc)) => Some((a.name, lc, rc))
              case _ => None
            }
        }
        if (widened.exists(_.isDefined)) {
          val lcols = ld.schema.fields.zip(widened).map {
            case (f, Some((n, lc, _))) => lc.as(n)
            case (f, None) => col(f.name)
          }
          val rcols = rd.schema.fields.zip(widened).map {
            case (f, Some((_, _, rc))) => rc.as(f.name)
            case (f, None) => col(f.name)
          }
          ld = ld.select(lcols.toSeq: _*)
          rd = rd.select(rcols.toSeq: _*)
        }
      }
      // distinct/intersect/except over DYNAMIC columns must use gtype
      // VALUE equality (1 = 1.0 collapses — cypher_setop.sql
      // `RETURN 1.0::int UNION RETURN 1::float` keeps one row), not struct
      // equality; dedupe on the order keys, keeping the LEFTMOST-branch
      // representative (`1.0::float UNION 1::int` renders 1.0 but
      // `1.0::int UNION 1::float` renders 1 — cypher_setop.out:124-143).
      def valueDistinct(df0: DataFrame): DataFrame = {
        import graft.gvalue.GValueCol
        val hasOrd = df0.columns.contains("__setop_ord")
        val df = if (hasOrd) df0.drop("__setop_ord") else df0
        val dyn = df.schema.fields.filter(f => GValueCol.isGValue(f.dataType))
        def unorderable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
          case _: org.apache.spark.sql.types.MapType => true
          case s: StructType => s.fields.exists(f => unorderable(f.dataType))
          case a: ArrayType => unorderable(a.elementType)
          case _ => false
        }
        if (dyn.isEmpty || df.schema.fields.exists(f => unorderable(f.dataType)))
          df.distinct()
        else {
          val keys = df.schema.fields.map { f =>
            if (GValueCol.isGValue(f.dataType)) GValueCol.orderKey(col(f.name))
            else col(f.name)
          }
          val ord = if (hasOrd) col("__setop_ord") else lit(0)
          val rowStruct = struct(df.columns.map(col).toIndexedSeq: _*)
          // tiebreak: branch order first (leftmost representative wins —
          // cypher_setop.out:124-143), then the row struct itself so equal
          // ord ties resolve deterministically (all fields are orderable
          // here: the unorderable check above routed maps to distinct())
          df0.groupBy(keys.toIndexedSeq: _*)
            .agg(min_by(rowStruct, struct(ord, rowStruct)).as("__row"))
            .select(df.columns.map(c => col(s"__row.$c")).toIndexedSeq: _*)
        }
      }
      def valueKeyed(df: DataFrame): (DataFrame, Seq[String]) = {
        import graft.gvalue.GValueCol
        val keyed = df.schema.fields.filter(f => GValueCol.isGValue(f.dataType))
          .foldLeft(df)((d, f) =>
            d.withColumn(s"__vk_${f.name}", GValueCol.orderKey(col(f.name))))
        (keyed, df.schema.fields.map(f =>
          if (GValueCol.isGValue(f.dataType)) s"__vk_${f.name}" else f.name).toSeq)
      }
      // NULL-safe keyed semi/anti join: PG set-op semantics (and Spark's
      // native intersect/except) treat NULLs as equal, so the value-keyed
      // path must join with <=> — plain `usingColumns` equality would drop
      // every NULL-bearing row from INTERSECT and keep it in EXCEPT.
      def valueSetJoin(l: DataFrame, r: DataFrame, how: String): DataFrame = {
        val (lk, keys) = valueKeyed(l)
        val (rk, _) = valueKeyed(r)
        val rsel = rk.select(keys.zipWithIndex.map {
          case (k, i) => col(k).as(s"__rk_$i") }: _*)
        val cond = keys.zipWithIndex.map {
          case (k, i) => lk(k) <=> rsel(s"__rk_$i") }.reduce(_ && _)
        lk.join(rsel, cond, how).select(l.columns.map(col).toIndexedSeq: _*)
      }
      op match {
        case "UNION" if all => ld.unionByName(rd)
        case "UNION"        => valueDistinct(
          ld.withColumn("__setop_ord", lit(0))
            .unionByName(rd.withColumn("__setop_ord", lit(1))))
        case "INTERSECT" if !ld.schema.fields.exists(f =>
          graft.gvalue.GValueCol.isGValue(f.dataType)) => ld.intersect(rd)
        case "INTERSECT" =>
          valueDistinct(valueSetJoin(ld, rd, "left_semi"))
        case "EXCEPT" if !ld.schema.fields.exists(f =>
          graft.gvalue.GValueCol.isGValue(f.dataType)) => ld.except(rd)
        case "EXCEPT" =>
          valueDistinct(valueSetJoin(ld, rd, "left_anti"))
      }
  }

  /** After the last clause the ctx must be a projected result (RETURN seen). */
  private def finish(ctx: Ctx): DataFrame = {
    require(ctx.projected, "query must end in RETURN")
    ctx.df
  }

  // ------------------------------------------------------------------ clauses

  def compileClause(ctx: Ctx, clause: Clause): Ctx = clause match {
    case m: Match  => compileMatch(ctx, m)
    case u: Unwind => compileUnwind(ctx, u)
    case w: With   => compileProjection(ctx, w.items, w.distinct, w.orderBy,
      w.skip, w.limit, w.where, isReturn = false, group = w.group,
      windows = w.windows)
    case r: Return => compileProjection(ctx, r.items, r.distinct, r.orderBy,
      r.skip, r.limit, None, isReturn = true, group = r.group,
      windows = r.windows)
    case c: CallSubquery => compileCallSubquery(ctx, c.query)
    case c: CallProc     => compileCallProc(ctx, c)
    case other => throw new UnsupportedOperationException(
      s"clause not supported yet: ${other.getClass.getSimpleName}")
  }

  // -------------------------------------------------------------------- CALL

  /** `CALL { subquery }` (reference: transform_cypher_call,
    * cypher_clause.c:331-432). Uncorrelated subqueries compile standalone and
    * cross-join the input; a leading import `WITH a, b` correlates by seeding
    * the subquery with the outer rows (tagged with a row id) — the
    * "previous clause as subquery RTE" decorrelation, so per-row semantics
    * cost one join on the row id instead of a lateral loop.
    */
  private def compileCallSubquery(ctx: Ctx, q: SingleQuery): Ctx = {
    require(q.clauses.forall {
      case _: Match | _: Unwind | _: With | _: Return | _: CallSubquery | _: CallProc => true
      case _ => false
    }, "CALL {} subquery must be read-only")
    val ret = q.clauses.last match {
      case r: Return => r
      case _ => throw new UnsupportedOperationException("CALL {} must end in RETURN")
    }
    val imports: List[String] = q.clauses.head match {
      case With(items, false, None, Nil, None, None, None, w)
        if w.isEmpty && items.nonEmpty && items.forall {
          case ReturnItem(Var(_), None) => true; case _ => false } =>
        items.map { case ReturnItem(Var(v), _) => v }
      case _ => Nil
    }
    if (ctx.df == null) {
      val sub = q.clauses.foldLeft(Ctx.empty)(compileClause)
      sub.copy(projected = false)
    } else if (imports.isEmpty) {
      val sub = q.clauses.foldLeft(Ctx.empty)(compileClause)
      val overlap = ctx.vars.keySet.intersect(sub.vars.keySet)
      require(overlap.isEmpty, s"CALL {} rebinds outer variables: $overlap")
      Ctx(ctx.df.crossJoin(sub.df), ctx.vars ++ sub.vars, ctx.projected)
    } else {
      require(imports.forall(ctx.vars.contains),
        s"CALL {} imports unbound variables: ${imports.filterNot(ctx.vars.contains)}")
      val rid = "__call_rid"
      // monotonically_increasing_id needs no global sort (a row_number
      // window would single-partition the whole input); localCheckpoint
      // freezes the ids so both sides of the rid join see the same values
      val outer = ctx.df.withColumn(rid, monotonically_increasing_id())
        .localCheckpoint()
      val seedCols = rid +: imports.flatMap(v =>
        if (ctx.vars(v).isEntity) outer.columns.filter(_.startsWith(s"${v}__")).toSeq
        else Seq(v))
      var sub = Ctx(outer.select(seedCols.map(col): _*),
        ListMap(imports.map(v => v -> ctx.vars(v)): _*), projected = false)
      q.clauses.tail.dropRight(1).foreach(c => sub = compileClause(sub, c))
      // ORDER/SKIP/LIMIT in the subquery RETURN are PER OUTER ROW —
      // partitionCol turns them into a row_number window keyed on rid
      sub = compileProjection(sub,
        ret.items :+ ReturnItem(Var(rid), Some(rid)),
        ret.distinct, ret.orderBy, ret.skip, ret.limit, None,
        isReturn = true, partitionCol = Some(rid))
      val overlap = ctx.vars.keySet.intersect(sub.vars.keySet - rid)
      require(overlap.isEmpty, s"CALL {} rebinds outer variables: $overlap")
      val joined = outer.join(sub.df, Seq(rid)).drop(rid)
      Ctx(joined, ctx.vars ++ (sub.vars - rid), ctx.projected)
    }
  }

  /** `CALL ns.fn() YIELD cols` — catalog table functions. */
  private def compileCallProc(ctx: Ctx, c: CallProc): Ctx = {
    import spark.implicits._
    if (c.srf) return compileCallSrf(ctx, c)
    val df = c.name match {
      case "db.labels" =>
        require(c.yields.length == 1, "db.labels yields one column")
        graph.vertexLabels.keys.toSeq.sorted.toDF(c.yields.head)
      case "db.relationshipTypes" =>
        require(c.yields.length == 1, "db.relationshipTypes yields one column")
        graph.edgeLabels.keys.toSeq.sorted.toDF(c.yields.head)
      case "get_cypher_keywords" =>
        // reference: sql/postgraph.sql.in get_cypher_keywords() SETOF
        // (word, catcode, catdesc); our grammar's keyword set, all
        // reserved-category like the reference's cypher keyword list
        require(c.yields.length == 3, "get_cypher_keywords yields (word, catcode, catdesc)")
        Parser.keywordList.map(k => (k.toLowerCase, "R", "reserved"))
          .toDF(c.yields: _*)
      case other => throw new UnsupportedOperationException(s"unknown procedure $other")
    }
    val out = if (ctx.df == null) df else ctx.df.crossJoin(df)
    Ctx(out, ctx.vars ++ c.yields.map(_ -> VarInfo.scalar), ctx.projected)
  }

  /** `CALL fn(args) AS v [WHERE pred]` — the old-regress SRF CALL
    * (cypher_call.sql:26-52): `unnest(list)` lateral-explodes one row per
    * element against the incoming binding; scalar functions emit one row;
    * WHERE filters the emitted rows before later clauses see them.
    */
  private def compileCallSrf(ctx0: Ctx, c: CallProc): Ctx = {
    val v = c.yields.head
    val ctx = if (ctx0.df == null)
      ctx0.copy(df = spark.range(1).toDF("__seed")) else ctx0
    val base = c.name.toLowerCase match {
      case "unnest" =>
        require(c.args.length == 1, "unnest(list) takes one argument")
        ctx.df.withColumn(v, explode(compileExpr(c.args.head, ctx)))
      case _ =>
        ctx.df.withColumn(v, compileExpr(FnCall(c.name, c.args, distinct = false), ctx))
    }
    val dropped = if (base.columns.contains("__seed")) base.drop("__seed") else base
    var out = Ctx(dropped, ctx0.vars + (v -> VarInfo.scalar), ctx0.projected)
    c.where.foreach { w => out = out.copy(df = out.df.filter(compileExpr(w, out))) }
    out
  }

  // ------------------------------------------------------------------- MATCH

  /** Pairwise edge-uniqueness quals for ONE PATH PATTERN (reference:
    * transform_match_path builds the qual per path,
    * cypher_clause.c:3294-3321; prevent_duplicate_edges /
    * _ag_enforce_edge_uniqueness): single edges compare ids `<>`, VLE
    * edge sets must not overlap, single-vs-VLE must not contain. Comma
    * patterns in one MATCH are NEVER cross-checked — `MATCH p=…ve1…,
    * …ve2… RETURN ve1 && ve2` yields TRUE overlaps
    * (old cypher_vle.out:169).
    */
  private def edgeUniqueness(df: DataFrame, singles: Seq[String],
      vles: Seq[String]): DataFrame = {
    val conds = scala.collection.mutable.ListBuffer.empty[Column]
    for (Seq(a, b) <- singles.combinations(2))
      conds += col(s"${a}__id") =!= col(s"${b}__id")
    for (Seq(a, b) <- vles.combinations(2))
      conds += !arrays_overlap(col(s"${a}__ids"), col(s"${b}__ids"))
    for (e <- singles; v <- vles)
      conds += !array_contains(col(s"${v}__ids"), col(s"${e}__id"))
    conds.foldLeft(df)((d, c) => d.filter(c))
  }

  /** Sargable conjuncts of a MATCH's WHERE, usable for manifest-stats
    * file pruning (r13): (alias, propKey) → [lo, hi] bounds from literal
    * `=`, `<`, `<=`, `>`, `>=` comparisons (either operand order; NEG-
    * wrapped numeric literals folded — the parser emits Un("NEG", Lit)).
    * Pruning is advisory: the WHERE filter itself still applies, so a
    * missed or over-wide hint only costs reads, never correctness.
    */
  private def pruneHintsOf(w: Expr): Map[(String, String),
      (Option[GValue], Option[GValue])] = {
    def lit(e: Expr): Option[GValue] = e match {
      case Lit(g: GInt) => Some(g)
      case Lit(g: GFloat) => Some(g)
      case Lit(g: GString) => Some(g)
      case Un("NEG", Lit(GInt(v))) => Some(GInt(-v))
      case Un("NEG", Lit(GFloat(v))) => Some(GFloat(-v))
      // r15: constant-fold temporal casts of strict-ISO-UTC string
      // literals ('2024-01-03'::date, '2024-01-03 12:00:00'::timestamp) —
      // date-range filters are the canonical 100 TB prune. Folding is
      // deliberately narrower than pgTimestampParse's style matrix: a
      // style the fold can't PROVE it parses identically to the runtime
      // kernel yields no hint (advisory pruning must never disagree with
      // the filter), so non-ISO forms and non-UTC offsets fold to None.
      case FnCall(fn, List(inner), false)
          if fn == "todate" || fn == "totimestamp" || fn == "totimestamptz" =>
        lit(inner) match {
          case Some(GString(s)) => Compiler.foldTemporalLit(fn, s)
          case _ => None
        }
      case _ => None
    }
    def conjuncts(e: Expr): List[Expr] = e match {
      case Bin("AND", a, b) => conjuncts(a) ++ conjuncts(b)
      case other => List(other)
    }
    val acc = scala.collection.mutable.Map.empty[(String, String),
      (Option[GValue], Option[GValue])]
    def add(a: String, k: String, lo: Option[GValue], hi: Option[GValue]): Unit = {
      val (l0, h0) = acc.getOrElse((a, k), (None, None))
      acc((a, k)) = (lo.orElse(l0), hi.orElse(h0))
    }
    conjuncts(w).foreach {
      case Bin("=", Prop(Var(a), k), r) => lit(r).foreach(g => add(a, k, Some(g), Some(g)))
      case Bin("=", l, Prop(Var(a), k)) => lit(l).foreach(g => add(a, k, Some(g), Some(g)))
      case Bin("<" | "<=", Prop(Var(a), k), r) => lit(r).foreach(g => add(a, k, None, Some(g)))
      case Bin(">" | ">=", Prop(Var(a), k), r) => lit(r).foreach(g => add(a, k, Some(g), None))
      case Bin("<" | "<=", l, Prop(Var(a), k)) => lit(l).foreach(g => add(a, k, Some(g), None))
      case Bin(">" | ">=", l, Prop(Var(a), k)) => lit(l).foreach(g => add(a, k, None, Some(g)))
      // r15: `n.k IN [literals]` claims the list's [min, max] envelope —
      // sound for membership (any match lies inside the envelope) when
      // every element folds AND the list stays in ONE stats domain
      // (numeric / string / temporal); a mixed-domain list would need a
      // cross-domain order the per-file stats don't record, so: no hint.
      case Bin("IN", Prop(Var(a), k), ListLit(items)) if items.nonEmpty =>
        val gs = items.map(lit)
        if (gs.forall(_.isDefined)) {
          val vs = gs.flatten
          def dom(g: GValue): Int = g match {
            case _: GInt | _: GFloat => 0
            case _: GString => 1
            case _: GTimestamp | _: GDate => 2
            case _ => -1
          }
          if (dom(vs.head) >= 0 && vs.forall(dom(_) == dom(vs.head))) {
            // Envelope min/max must be picked in the SAME order
            // FileStats.mayOverlap compares in (ADVICE r15): strings in
            // code-point order (GValue.cmp is UTF-16 compareTo, which
            // disagrees when supplementary-plane chars mix with
            // U+E000..U+FFFF), numerics via exact BigDecimal (cmp's
            // long-as-double rounds above 2^53 and can pick an envelope
            // edge smaller than the true max). Temporal cmp is exact
            // micros/days — matches mayOverlap's order as-is.
            val le: (GValue, GValue) => Boolean = dom(vs.head) match {
              case 1 => (x, y) => GraphStore.cpLe(x.asInstanceOf[GString].s,
                y.asInstanceOf[GString].s)
              case 0 =>
                def bd(g: GValue): Option[BigDecimal] = g match {
                  case GInt(n) => Some(BigDecimal(n))
                  case GFloat(d) =>
                    if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d))
                  case _ => None
                }
                (x, y) => (bd(x), bd(y)) match {
                  case (Some(a0), Some(b0)) => a0 <= b0
                  case _ => GValue.cmp(x, y) <= 0
                }
              case _ => (x, y) => GValue.cmp(x, y) <= 0
            }
            // non-finite doubles make the envelope unbounded on that side;
            // simplest sound move: emit no hint when any element is one
            val finite = !vs.exists {
              case GFloat(d) => d.isNaN || d.isInfinite
              case _ => false
            }
            if (finite)
              add(a, k, Some(vs.reduce((x, y) => if (le(x, y)) x else y)),
                Some(vs.reduce((x, y) => if (le(x, y)) y else x)))
          }
        }
      case _ => ()
    }
    acc.toMap
  }

  /** WHERE-derived pruning hints active while THIS match's patterns
    * compile; saved/restored around nested compiles (EXISTS sublinks).
    */
  private var pruneHints: Map[(String, String),
    (Option[GValue], Option[GValue])] = Map.empty

  private def compileMatch(ctx: Ctx, m: Match): Ctx = {
    val savedHints = pruneHints
    pruneHints = m.where.map(pruneHintsOf).getOrElse(Map.empty)
    try compileMatchInner(ctx, m) finally pruneHints = savedHints
  }

  private def compileMatchInner(ctx: Ctx, m: Match): Ctx = {
    if (m.optional) {
      // Compile the pattern fresh, then LEFT JOIN on the shared entity vars
      // (reference: transform_cypher_match builds JOIN_LEFT,
      // cypher_clause.c:2283-2490).
      var inner = m.patterns.foldLeft(Ctx.empty) { (c, p) =>
        val collect = new EdgeCollector // uniqueness scope = one path
        val c2 = compilePattern(c, p, collect)
        c2.copy(df = edgeUniqueness(c2.df, collect.singles.toSeq,
          collect.vles.toSeq))
      }
      m.where.foreach { w =>
        inner = compileWhere(ensureVleValues(inner, Seq(w)), w)
      }
      val shared = ctx.vars.keySet.intersect(inner.vars.keySet).toSeq.sorted
      // leading OPTIONAL MATCH (no prior clause): left-join the pattern
      // from a one-row unit relation — pattern rows when any, one
      // null-extended row when none (reference cypher_match.sql:630)
      val outer = if (ctx.df != null) ctx.df
        else spark.range(1).select(lit(true).as("__unit0"))
      // inner side keeps only its NEW columns plus temp join keys for the
      // shared vars (outer side owns the shared vars' columns)
      val dropCols = shared.flatMap(v =>
        inner.df.columns.filter(c => c.startsWith(s"${v}__") && c != s"${v}__id"))
      val renamed = shared.foldLeft(inner.df.drop(dropCols: _*))((df, v) =>
        df.withColumnRenamed(s"${v}__id", s"__opt_${v}__id"))
      val cond = shared.map(v => col(s"${v}__id") === col(s"__opt_${v}__id"))
        .reduceOption(_ && _).getOrElse(lit(true))
      val joined = outer.join(renamed, cond, "left_outer")
        .drop("__unit0" +: shared.map(v => s"__opt_${v}__id"): _*)
      // drop duplicated non-id columns of shared vars from the inner side kept once
      Ctx(joined, ctx.vars ++ (inner.vars -- ctx.vars.keySet), ctx.projected)
    } else {
      var out = m.patterns.foldLeft(ctx) { (c, p) =>
        val collect = new EdgeCollector // uniqueness scope = one path
        val c2 = compilePattern(c, p, collect)
        c2.copy(df = edgeUniqueness(c2.df, collect.singles.toSeq,
          collect.vles.toSeq))
      }
      m.where.foreach { w =>
        out = compileWhere(out, w)
      }
      out
    }
  }

  /** WHERE with top-level EXISTS((pattern)) / NOT EXISTS rewritten to
    * semi/anti joins (reference: transform_cypher_sub_pattern,
    * cypher_clause.c:2575-2636); everything else is a plain filter.
    */
  private def compileWhere(ctx: Ctx, w: Expr): Ctx = w match {
    case Bin("AND", l, r) => compileWhere(compileWhere(ctx, l), r)
    case ExistsPattern(p) => existsJoin(ctx, p, anti = false)
    case Un("NOT", ExistsPattern(p)) => existsJoin(ctx, p, anti = true)
    case ExistsSubquery(q) => existsSubJoin(ctx, q, anti = false)
    case Un("NOT", ExistsSubquery(q)) => existsSubJoin(ctx, q, anti = true)
    case s: SubLink => subLinkJoin(ctx, s)
    case other =>
      val c = ensureVleValues(ctx, Seq(other))
      // sublinks in general positions (OR branches, CASE …) become derived
      // boolean columns, dropped once the filter has consumed them
      val (c2, rewritten, added) = bindSublinks(c, Seq(other))
      c2.copy(df = c2.df.filter(compileExpr(rewritten.head, c2)).drop(added: _*))
  }

  /** EXISTS(MATCH ... RETURN ...): correlation is by shared variables, so the
    * final RETURN is irrelevant to existence — compile the body and semi/anti
    * join on the shared entity ids (reference: CSP_EXISTS sublink).
    */
  private def existsSubJoin(ctx: Ctx, q: SingleQuery, anti: Boolean): Ctx = {
    val body = q.clauses.dropRight(1) match {
      case Nil => q.clauses // RETURN-only subquery: fall through
      case b => b
    }
    val inner = body.foldLeft(Ctx.empty)(compileClause)
    val shared = ctx.vars.keySet.intersect(inner.vars.keySet)
      .filter(v => ctx.vars(v).isEntity).toSeq.sorted
    require(shared.nonEmpty, "EXISTS(subquery) must share a variable with the outer query")
    val proj = inner.df.select(shared.map(v => col(s"${v}__id").as(s"__ex_${v}__id")): _*)
    val cond = shared.map(v => col(s"${v}__id") === col(s"__ex_${v}__id")).reduce(_ && _)
    Ctx(ctx.df.join(proj, cond, if (anti) "left_anti" else "left_semi"), ctx.vars, ctx.projected)
  }

  /** `expr op ANY/ALL (MATCH ... RETURN item)` — ANY: semi join where the
    * comparison holds for some subquery row; ALL: anti join dropping rows
    * where any subquery row compares false-or-null (SQL sublink semantics;
    * empty subquery → ALL true, ANY false).
    */
  private def subLinkJoin(ctx: Ctx, s: SubLink): Ctx = {
    val ret = s.query.clauses.last match {
      case r: Return =>
        require(r.items.length == 1, "ANY/ALL subquery must return one item")
        r
      case _ => throw new UnsupportedOperationException("ANY/ALL subquery must end in RETURN")
    }
    val inner = s.query.clauses.dropRight(1).foldLeft(Ctx.empty)(compileClause)
    val shared = ctx.vars.keySet.intersect(inner.vars.keySet)
      .filter(v => ctx.vars(v).isEntity).toSeq.sorted
    val subVal = compileExpr(ret.items.head.expr, inner).as("__sl_val")
    val proj = inner.df.select(
      shared.map(v => col(s"${v}__id").as(s"__sl_${v}__id")) :+ subVal: _*)
    val sharedCond = shared.map(v => col(s"${v}__id") === col(s"__sl_${v}__id"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val leftCol = compileExpr(s.left, ctx)
    val cmp = binOp(s.op, leftCol, col("__sl_val"), ctx)
    if (s.kind == "ANY")
      Ctx(ctx.df.join(proj, sharedCond && cmp, "left_semi"), ctx.vars, ctx.projected)
    else // ALL: drop rows with a false-or-null comparison against any sub row
      Ctx(ctx.df.join(proj, sharedCond && (!cmp || cmp.isNull), "left_anti"),
        ctx.vars, ctx.projected)
  }

  // ------------------------------------------ sublinks as general expressions

  private var sbCounter = 0
  private def freshSb(): String = { sbCounter += 1; s"__sb$sbCounter" }

  /** EXISTS / ANY / ALL nested anywhere inside an expression (an OR branch,
    * a RETURN item, a CASE condition …) — the reference treats them as
    * ordinary sublink expressions (cypher_expr.c:82; regress
    * cypher_match.sql:98-130). Each sublink becomes ONE left join deriving a
    * boolean column; the expression is rewritten to reference it. Top-level
    * WHERE conjuncts keep the cheaper semi/anti-join path in
    * [[compileWhere]]. Returns (ctx-with-joins, rewritten exprs, helper
    * columns to drop once consumed).
    */
  private def bindSublinks(ctx0: Ctx, exprs: Seq[Expr]): (Ctx, Seq[Expr], Seq[String]) = {
    var ctx = ctx0
    val added = scala.collection.mutable.ListBuffer.empty[String]
    def bindExists(inner: Ctx): Expr = {
      val shared = ctx.vars.keySet.intersect(inner.vars.keySet)
        .filter(v => ctx.vars(v).isEntity).toSeq.sorted
      require(shared.nonEmpty,
        "EXISTS must share a variable with the outer query")
      val flag = freshSb()
      // distinct on the join keys → at most one match per outer row: the
      // left join cannot change outer multiplicity
      val proj = inner.df
        .select(shared.map(v => col(s"${v}__id").as(s"${flag}_${v}")): _*)
        .distinct().withColumn(flag, lit(true))
      val cond = shared.map(v => col(s"${v}__id") === col(s"${flag}_${v}")).reduce(_ && _)
      val df = ctx.df.join(proj, cond, "left_outer")
        .withColumn(flag, coalesce(col(flag), lit(false)))
        .drop(shared.map(v => s"${flag}_${v}"): _*)
      ctx = ctx.copy(df = df)
      added += flag
      BoolCol(flag)
    }
    def bindSubLink(s: SubLink): Expr = {
      // the comparison references OUTER columns, so matches can't be
      // pre-aggregated: tag rows, semi-join the matching row ids, flag them
      val flag = freshSb()
      val rid = s"${flag}_rid"
      val tagged = ctx.df.withColumn(rid, monotonically_increasing_id())
        .localCheckpoint() // freeze ids: probe and join-back must agree
      val ret = s.query.clauses.last match {
        case r: Return =>
          require(r.items.length == 1, "ANY/ALL subquery must return one item")
          r
        case _ => throw new UnsupportedOperationException("ANY/ALL subquery must end in RETURN")
      }
      val inner = s.query.clauses.dropRight(1).foldLeft(Ctx.empty)(compileClause)
      val shared = ctx.vars.keySet.intersect(inner.vars.keySet)
        .filter(v => ctx.vars(v).isEntity).toSeq.sorted
      val subVal = compileExpr(ret.items.head.expr, inner).as("__sl_val")
      val proj = inner.df.select(
        shared.map(v => col(s"${v}__id").as(s"${flag}_${v}")) :+ subVal: _*)
      val sharedCond = shared.map(v => col(s"${v}__id") === col(s"${flag}_${v}"))
        .reduceOption(_ && _).getOrElse(lit(true))
      val cmp = binOp(s.op, compileExpr(s.left, ctx.copy(df = tagged)), col("__sl_val"), ctx)
      // ANY: true iff some row compares true. ALL: true iff NO row compares
      // false-or-null (empty subquery → ALL true, ANY false).
      val probeCond =
        if (s.kind == "ANY") sharedCond && cmp
        else sharedCond && (!cmp || cmp.isNull)
      val hit = tagged.join(proj, probeCond, "left_semi")
        .select(col(rid)).withColumn(flag, lit(true))
      var df = tagged.join(hit, Seq(rid), "left_outer")
        .withColumn(flag,
          if (s.kind == "ANY") coalesce(col(flag), lit(false))
          else !coalesce(col(flag), lit(false)))
        .drop(rid)
      ctx = ctx.copy(df = df)
      added += flag
      BoolCol(flag)
    }
    def walk(e: Expr): Expr = e match {
      case ExistsPattern(p)  =>
        val collect = new EdgeCollector
        val sub = compilePattern(Ctx.empty, p, collect)
        bindExists(sub.copy(df = edgeUniqueness(sub.df,
          collect.singles.toSeq, collect.vles.toSeq)))
      case ExistsSubquery(q) =>
        val body = q.clauses.dropRight(1) match {
          case Nil => q.clauses // RETURN-only subquery
          case b   => b
        }
        bindExists(body.foldLeft(Ctx.empty)(compileClause))
      case s: SubLink        => bindSubLink(s)
      case Bin(op, l, r)     => Bin(op, walk(l), walk(r))
      case Un(op, x)         => Un(op, walk(x))
      case IsNull(x, n)      => IsNull(walk(x), n)
      case StringOp(op, l, r) => StringOp(op, walk(l), walk(r))
      case FnCall(n, args, d) => FnCall(n, args.map(walk), d)
      case CaseExpr(op, whens, o) =>
        CaseExpr(op.map(walk), whens.map { case (c, v) => (walk(c), walk(v)) }, o.map(walk))
      case Index(b, i)       => Index(walk(b), walk(i))
      case Slice(b, l, h)    => Slice(walk(b), l.map(walk), h.map(walk))
      case ListLit(items)    => ListLit(items.map(walk))
      case MapLit(es)        => MapLit(es.map { case (k, v) => (k, walk(v)) })
      case other             => other
    }
    val out = exprs.map(walk)
    (ctx, out, added.toSeq)
  }

  private def existsJoin(ctx: Ctx, p: PathPattern, anti: Boolean): Ctx = {
    // edge-uniqueness applies INSIDE the sub-pattern too: a bound edge
    // used across two hops (`EXISTS((u)-[e]->(u)-[e]->(u))`) is a
    // contradiction → empty (cypher_match.out:1090)
    val collect = new EdgeCollector
    val inner0 = compilePattern(Ctx.empty, p, collect)
    val inner = inner0.copy(df = edgeUniqueness(inner0.df,
      collect.singles.toSeq, collect.vles.toSeq))
    val shared = ctx.vars.keySet.intersect(inner.vars.keySet).toSeq.sorted
    require(shared.nonEmpty, "EXISTS pattern must share a variable with the outer query")
    val proj = inner.df.select(shared.map(v => col(s"${v}__id").as(s"__ex_${v}__id")): _*)
    val cond = shared.map(v => col(s"${v}__id") === col(s"__ex_${v}__id")).reduce(_ && _)
    Ctx(ctx.df.join(proj, cond, if (anti) "left_anti" else "left_semi"), ctx.vars, ctx.projected)
  }

  /** Accumulates the edge aliases of one MATCH for uniqueness quals. */
  private final class EdgeCollector {
    val singles = scala.collection.mutable.LinkedHashSet.empty[String]
    val vles = scala.collection.mutable.LinkedHashSet.empty[String]
  }

  // pattern → joins folded into ctx
  private def compilePattern(ctx0: Ctx, pattern: PathPattern,
      collect: EdgeCollector = new EdgeCollector): Ctx = {
    var ctx = ctx0
    val elems = pattern.elements

    def nodeAlias(n: NodePattern): String = n.variable.getOrElse(freshAlias())

    // process first node
    val firstNode = elems.head.asInstanceOf[NodePattern]
    var prevAlias = nodeAlias(firstNode)
    // the pattern labels of the node that prevAlias currently denotes —
    // valid constraints on its rows after bindNode (fresh bind scans the
    // label table; re-mention filters on it), consumed by bindVle's
    // endpoint-label branch pruning
    var prevNodeLabels = firstNode.labels
    val nodeAliases = scala.collection.mutable.ListBuffer(prevAlias)
    val edgeAliases = scala.collection.mutable.ListBuffer.empty[String]
    ctx = bindNode(ctx, prevAlias, firstNode, joinOn = None)

    var rest = elems.tail
    while (rest.nonEmpty) {
      val rel = rest.head.asInstanceOf[RelPattern]
      val node = rest(1).asInstanceOf[NodePattern]
      val nextAlias = nodeAlias(node)
      rel.varLength match {
        case None =>
          val named = rel.variable.getOrElse(freshAlias())
          // re-mentioned edge variable: bind under a fresh alias, then
          // constrain to the SAME edge id — combined with the per-MATCH
          // edge-uniqueness quals this is the reference behavior (e.g.
          // `(u)-[e]->(u)-[e]->(u)` is a contradiction → empty, not an
          // error; regress cypher_match.sql:176)
          val remention = ctx.vars.contains(named)
          val relAlias = if (remention) freshAlias() else named
          edgeAliases += relAlias
          collect.singles += relAlias
          ctx = bindRelAndNode(ctx, prevAlias, relAlias, rel, nextAlias, node)
          if (remention)
            ctx = ctx.copy(df = ctx.df.filter(
              col(s"${relAlias}__id") === col(s"${named}__id")))
        case Some((lo, hi)) =>
          val relAlias = rel.variable.getOrElse(freshAlias())
          edgeAliases += relAlias
          collect.vles += relAlias
          ctx = bindVle(ctx, prevAlias, rel, relAlias, lo, hi, nextAlias, node,
            prevNodeLabels)
      }
      nodeAliases += nextAlias
      prevAlias = nextAlias
      prevNodeLabels = node.labels
      rest = rest.drop(2)
    }
    // path variable: member aliases back nodes()/relationships()/length()
    pattern.variable.foreach { pv =>
      ctx = ctx.copy(vars = ctx.vars +
        (pv -> VarInfo.path(nodeAliases.toSeq, edgeAliases.toSeq)))
    }
    ctx
  }

  /** Equality resolved against a specific frame, dynamic-value aware. */
  private def eqOn(df: DataFrame, l: Column, r: Column): Column = {
    import graft.gvalue.GValueCol
    def t(c: Column) = scala.util.Try(df.select(c).schema.head.dataType).toOption
    (t(l), t(r)) match {
      case (Some(a), Some(b)) if GValueCol.isGValue(a) && GValueCol.isGValue(b) =>
        GValueCol.eqv(l, r)
      case (Some(a), Some(b)) if GValueCol.isGValue(a) && GValueCol.canEncode(b) =>
        GValueCol.eqv(l, GValueCol.encode(r, b))
      case (Some(a), Some(b)) if GValueCol.isGValue(b) && GValueCol.canEncode(a) =>
        GValueCol.eqv(GValueCol.encode(l, a), r)
      case _ => l === r
    }
  }

  /** Property-map filter condition for one `(n {k: v})` entry — the
    * reference's `properties @> {k:v}` containment (gtype_contains,
    * gtype_ops.c:849-894; goldens regress/sql/cypher_match.sql "Property
    * constraints"): scalars compare by equality; a map literal is key-wise
    * containment of the stored map; a list literal requires every element
    * present in the stored array. NULL anywhere → no match (3VL filter).
    */
  /** Scan-time property filter; a property no row of the label carries
    * has no column at all — that is an EMPTY match (reference: a missing
    * key probes to no tuples), not an unresolved-column error. MERGE's
    * existence probe relies on this (`MERGE ({i: 1})` on a fresh graph).
    */
  private def propFilter(df: DataFrame, alias: String, k: String, v: Expr,
      ctx: Ctx): Column = {
    val cn = s"${alias}__${PropNames.esc(k)}"
    if (!df.columns.contains(cn)) lit(false)
    else propCond(df, col(cn), v, ctx)
  }

  private def propCond(df: DataFrame, c: Column, v: Expr, ctx: Ctx): Column = v match {
    // container literal against a DYNAMIC (gvalue) stored property:
    // compare via the codec's canonical equality
    case _ if litGValue(v).exists(g => g.isInstanceOf[GArray] || g.isInstanceOf[GMap]) &&
        scala.util.Try(df.select(c).schema.head.dataType)
          .toOption.exists(graft.gvalue.GValueCol.isGValue) =>
      coalesce(graft.gvalue.GValueCol.eqv(c,
        graft.gvalue.GValueCol.gLit(litGValue(v).get)), lit(false))
    case MapLit(entries) if entries.nonEmpty =>
      entries.map { case (k, ve) =>
        element_at(c, lit(k)) === compileExpr(ve, ctx)
      }.reduce(_ && _)
    case ListLit(items) if items.nonEmpty &&
      scala.util.Try(df.select(c).schema.head.dataType)
        .toOption.exists(_.isInstanceOf[ArrayType]) =>
      items.map(i => array_contains(c, compileExpr(i, ctx))).reduce(_ && _)
    case other => eqOn(df, c, compileExpr(other, ctx))
  }

  /** Scan a vertex label table with columns renamed to `alias__*`. */
  private def vertexScan(alias: String, labels: List[String],
      props: Map[String, Expr], ctx: Ctx): DataFrame = {
    val base = labels match {
      case Nil =>
        // r14 (VERDICT r13 #3): the unlabeled scan is the reference's
        // default-label parent scan, which its GIN index serves too — a
        // scalar-literal property filter prunes each union branch's file
        // list independently (filters still apply on top, so the pruned
        // view only narrows, never decides)
        val pruned = {
          val fromProps = props.iterator.flatMap {
            case (k, Lit(g)) =>
              graph.unionPruned("v", PropNames.esc(k), Some(g), Some(g))
            case _ => None
          }
          val fromWhere = pruneHints.iterator.flatMap {
            case ((a, k), (lo, hi)) if a == alias =>
              graph.unionPruned("v", PropNames.esc(k), lo, hi)
            case _ => None
          }
          (fromProps ++ fromWhere).nextOption()
        }
        pruned.getOrElse(graph.allVertices)
          .withColumnRenamed("__label", "label")
      case l :: more =>
        // `(n:A:B)` is label conjunction; vertices carry exactly one label
        // (reference: one table per label, ag_label.h), so every extra
        // DISTINCT label must also hold — filter on all of them rather than
        // silently matching only the first (folds to empty when they differ).
        val whole = graph.vertexLabels.getOrElse(l,
          throw new UnknownLabelException(s"unknown vertex label $l"))
        // r13 manifest-stats skipping: a scalar-literal property filter
        // (prop map or a sargable WHERE conjunct) may prune the label's
        // FILE LIST before the scan is built (the GIN property-index
        // analog); the filters themselves still apply below/after, so the
        // pruned scan only narrows, never decides. r14: multi-label
        // conjunctions prune too — the extra-label filters are orthogonal
        // to which files can hold the property value.
        val pruned = {
            val fromProps = props.iterator.flatMap {
              case (k, Lit(g)) =>
                graph.statsPrune("v", l, PropNames.esc(k), Some(g), Some(g), whole)
              case _ => None
            }
            val fromWhere = pruneHints.iterator.flatMap {
              case ((a, k), (lo, hi)) if a == alias =>
                graph.statsPrune("v", l, PropNames.esc(k), lo, hi, whole)
              case _ => None
            }
            (fromProps ++ fromWhere).nextOption()
          }
        val first = pruned.getOrElse(whole).withColumn("label", lit(l))
        more.foldLeft(first)((df, extra) => df.filter(col("label") === lit(extra)))
    }
    // ONE select instead of a withColumnRenamed chain (r16, guide §1.2:
    // per-query analysis time): each withColumnRenamed wraps the plan in
    // another Project, and a wide label table renamed column-by-column
    // made every scan contribute O(columns) nested Projects to analysis.
    // Dataset.apply resolves the name EXACTLY (dots and all), matching
    // withColumnRenamed's lookup.
    val renamed = base.select(
      base.columns.map(c => base(c).as(s"${alias}__$c")).toSeq: _*)
    props.foldLeft(renamed) { case (df, (k, v)) =>
      df.filter(propFilter(df, alias, k, v, ctx))
    }
  }

  private def edgeScan(alias: String, types: List[String],
      props: Map[String, Expr], ctx: Ctx): DataFrame = {
    val base = types match {
      case Nil =>
        // r14: per-branch file pruning for the untyped edge scan (same
        // union-view hook as the unlabeled vertex scan)
        val pruned = {
          val fromProps = props.iterator.flatMap {
            case (k, Lit(g)) =>
              graph.unionPruned("e", PropNames.esc(k), Some(g), Some(g))
            case _ => None
          }
          val fromWhere = pruneHints.iterator.flatMap {
            case ((a, k), (lo, hi)) if a == alias =>
              graph.unionPruned("e", PropNames.esc(k), lo, hi)
            case _ => None
          }
          (fromProps ++ fromWhere).nextOption()
        }
        pruned.getOrElse(graph.allEdges).withColumnRenamed("__label", "label")
      case t :: Nil =>
        val whole = graph.edgeLabels.getOrElse(t,
          throw new UnknownLabelException(s"unknown edge label $t"))
        // r13 manifest-stats skipping, edge twin of the vertexScan hook
        val pruned = {
          val fromProps = props.iterator.flatMap {
            case (k, Lit(g)) =>
              graph.statsPrune("e", t, PropNames.esc(k), Some(g), Some(g), whole)
            case _ => None
          }
          val fromWhere = pruneHints.iterator.flatMap {
            case ((a, k), (lo, hi)) if a == alias =>
              graph.statsPrune("e", t, PropNames.esc(k), lo, hi, whole)
            case _ => None
          }
          (fromProps ++ fromWhere).nextOption()
        }
        pruned.getOrElse(whole).withColumn("label", lit(t))
      case many =>
        val common = many.map(t => graph.edgeLabels(t).columns.toSet)
          .reduce(_ intersect _).toSeq.sorted :+ "label"
        // r14: each named type is its own scan — prune each branch's file
        // list independently, exactly like the single-type arm
        def branch(t: String): DataFrame = {
          val whole = graph.edgeLabels(t)
          val fromProps = props.iterator.flatMap {
            case (k, Lit(g)) =>
              graph.statsPrune("e", t, PropNames.esc(k), Some(g), Some(g), whole)
            case _ => None
          }
          val fromWhere = pruneHints.iterator.flatMap {
            case ((a, k), (lo, hi)) if a == alias =>
              graph.statsPrune("e", t, PropNames.esc(k), lo, hi, whole)
            case _ => None
          }
          (fromProps ++ fromWhere).nextOption().getOrElse(whole)
        }
        many.map(t => branch(t).withColumn("label", lit(t))
          .select(common.map(col): _*)).reduce(_ unionByName _)
    }
    // ONE select instead of a withColumnRenamed chain (r16, guide §1.2:
    // per-query analysis time): each withColumnRenamed wraps the plan in
    // another Project, and a wide label table renamed column-by-column
    // made every scan contribute O(columns) nested Projects to analysis.
    // Dataset.apply resolves the name EXACTLY (dots and all), matching
    // withColumnRenamed's lookup.
    val renamed = base.select(
      base.columns.map(c => base(c).as(s"${alias}__$c")).toSeq: _*)
    props.foldLeft(renamed) { case (df, (k, v)) =>
      df.filter(propFilter(df, alias, k, v, ctx))
    }
  }


  /** Does the expression reference any of the given (outer) variables? */
  private def referencesVars(e: Expr, vars: Set[String]): Boolean = e match {
    case Var(n)            => vars(n)
    case Prop(b, _)        => referencesVars(b, vars)
    case Lit(_) | Param(_) | CountStar() => false
    case ListLit(items)    => items.exists(referencesVars(_, vars))
    case MapLit(entries)   => entries.exists(kv => referencesVars(kv._2, vars))
    case Bin(_, l, r)      => referencesVars(l, vars) || referencesVars(r, vars)
    case Un(_, x)          => referencesVars(x, vars)
    case IsNull(x, _)      => referencesVars(x, vars)
    case StringOp(_, l, r) => referencesVars(l, vars) || referencesVars(r, vars)
    case FnCall(_, args, _) => args.exists(referencesVars(_, vars))
    case CaseExpr(op, whens, otherwise) =>
      op.exists(referencesVars(_, vars)) ||
        whens.exists(w => referencesVars(w._1, vars) || referencesVars(w._2, vars)) ||
        otherwise.exists(referencesVars(_, vars))
    case Index(b, i)    => referencesVars(b, vars) || referencesVars(i, vars)
    case Slice(b, l, h) => referencesVars(b, vars) ||
      l.exists(referencesVars(_, vars)) || h.exists(referencesVars(_, vars))
    case ListComp(_, src, where, proj) => referencesVars(src, vars) ||
      where.exists(referencesVars(_, vars)) || proj.exists(referencesVars(_, vars))
    case _ => true // sublinks / exists: be conservative, defer past the join
  }

  /** Deterministic dimension broadcast: pattern-join scan sides whose
    * OPTIMIZER estimate (parquet file sizes after pruning) is under the
    * session's autoBroadcastJoinThreshold get an explicit broadcast hint
    * at COMPILE time. Without the hint the choice is made per-run from
    * runtime stats (AQE), and round-9's bench showed g9_undirected's
    * union-both-orientations join flipping plans across identical-code
    * runs (2.6× swing). Label tables above the threshold — or in-memory
    * write-path tables, whose LogicalRDD estimate is defaultSizeInBytes —
    * keep the shuffle join, which is the right 100 TB shape.
    */
  private def hintSmall(df: DataFrame): DataFrame = {
    val t = spark.sessionState.conf.autoBroadcastJoinThreshold
    if (t > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(t)) broadcast(df)
    else df
  }

  private def bindNode(ctx: Ctx, alias: String, n: NodePattern,
      joinOn: Option[Column]): Ctx = {
    if (ctx.vars.contains(alias)) {
      // re-mention of a bound variable: additional label/prop constraints
      var df = ctx.df
      n.labels.foreach(l => df = df.filter(col(s"${alias}__label") === lit(l)))
      n.props.foreach { case (k, v) =>
        df = df.filter(propFilter(df, alias, k, v, ctx))
      }
      ctx.copy(df = df)
    } else {
      // prop filters referencing OUTER variables (`(m {i: n.i})`) can only
      // resolve after the join — split them off the scan-time filters
      val (correlated, local) = n.props.partition { case (_, v) =>
        ctx.df != null && referencesVars(v, ctx.vars.keySet)
      }
      val scan = vertexScan(alias, n.labels, local, ctx)
      var df =
        if (ctx.df == null) scan
        else joinOn match {
          case Some(cond) => ctx.df.join(hintSmall(scan), cond)
          case None       => ctx.df.crossJoin(scan)
        }
      val out = Ctx(df, ctx.vars + (alias -> VarInfo.vertex), ctx.projected)
      correlated.foreach { case (k, v) =>
        df = df.filter(propFilter(df, alias, k, v, out))
      }
      out.copy(df = df)
    }
  }

  private def bindRelAndNode(ctx0: Ctx, prev: String, relAlias: String,
      rel: RelPattern, next: String, node: NodePattern): Ctx = {
    var ctx = ctx0
    // same correlated-prop split as bindNode, for the edge's property map
    val (corrRel, localRel) = rel.props.partition { case (_, v) =>
      ctx.df != null && referencesVars(v, ctx.vars.keySet)
    }
    val scan0 = edgeScan(relAlias, rel.types, localRel, ctx)
    // orient: dir=1  prev--start, end--next; dir=-1 reversed; dir=0 union both
    val scan = rel.dir match {
      case 1  => scan0
        .withColumn(s"${relAlias}__gsrc", col(s"${relAlias}__start_id"))
        .withColumn(s"${relAlias}__gdst", col(s"${relAlias}__end_id"))
      case -1 => scan0
        .withColumn(s"${relAlias}__gsrc", col(s"${relAlias}__end_id"))
        .withColumn(s"${relAlias}__gdst", col(s"${relAlias}__start_id"))
      case 0 =>
        scan0.withColumn(s"${relAlias}__gsrc", col(s"${relAlias}__start_id"))
          .withColumn(s"${relAlias}__gdst", col(s"${relAlias}__end_id"))
          .unionByName(
            // union-ALL of both orientations, self-loops included: a
            // single-hop undirected MATCH counts a self-loop twice (the
            // reference's join-qual path, make_path_join_quals — unlike the
            // VLE DFS below, which visits a loop edge once)
            scan0.withColumn(s"${relAlias}__gsrc", col(s"${relAlias}__end_id"))
              .withColumn(s"${relAlias}__gdst", col(s"${relAlias}__start_id")))
    }
    require(!ctx.vars.contains(relAlias), s"edge variable $relAlias reused")
    var df = ctx.df.join(hintSmall(scan), col(s"${prev}__id") === col(s"${relAlias}__gsrc"))
    ctx = Ctx(df, ctx.vars + (relAlias -> VarInfo.edge), ctx.projected)
    corrRel.foreach { case (k, v) =>
      ctx = ctx.copy(df = ctx.df.filter(
        propCond(ctx.df, col(s"${relAlias}__$k"), v, ctx)))
    }
    if (ctx.vars.contains(next)) {
      // closing a cycle: next already bound
      var out = ctx.df.filter(col(s"${relAlias}__gdst") === col(s"${next}__id"))
      node.labels.foreach(l => out = out.filter(col(s"${next}__label") === lit(l)))
      node.props.foreach { case (k, v) =>
        out = out.filter(propCond(out, col(s"${next}__$k"), v, ctx))
      }
      ctx.copy(df = out)
    } else {
      bindNode(ctx, next, node,
        joinOn = Some(col(s"${relAlias}__gdst") === col(s"${next}__id")))
    }
  }

  /** Variable-length edge expansion — the reference's DFS-based `vle()` SRF
    * (/root/reference/src/backend/utils/path_finding/dfs.c:666-775) re-expressed
    * as iterative frontier joins with per-path edge-uniqueness (the
    * accumulated-edge-array ¬contains predicate). Bounded [lo, hi]; `hi`
    * defaults to [[Compiler.VleMaxHops]] for unbounded `*..` (fixpoint-safe:
    * edge-uniqueness bounds path length by |E| anyway).
    */
  private def bindVle(ctx0: Ctx, prev: String, rel: RelPattern, relAlias: String,
      lo: Int, hiOpt: Option[Int], next: String, node: NodePattern,
      prevLabels: List[String] = Nil): Ctx = {
    val ctx = ctx0
    // unbounded `*..` iterates to the edge-uniqueness fixpoint (paths are
    // simple in edges, so ≤ |E| hops); the literal bound is a safety rail,
    // not a semantic cap — the loop exits as soon as a frontier empties
    val hi = hiOpt.getOrElse(Int.MaxValue - 1)
    require(lo >= 0 && hi >= lo, s"bad VLE bounds *$lo..$hi")
    // the reference's VLE NEVER produces a zero-length path: `*0..` counts
    // exactly as `*1..` (old cypher_vle.out:248-260 both 400) and `*0..0`
    // returns nothing (cypher_vle.out:707-717) — the DFS seeds with one
    // edge before checking bounds (dfs.c:666-775)
    val lo1 = math.max(1, lo)
    val e = freshAlias()
    // `ostart` = the edge's ORIGINAL start_id regardless of traversal
    // orientation — the reference's materialized traversal prints interior
    // vertex i (i ≥ 2) as edge i's start endpoint rather than its arrival
    // vertex (old cypher_vle.out:310-324: `…, "main edge" 281→282}, {"id":
    // …281,…}, {bypass 282→…}` — the vertex between contradicts both
    // edges), so the display sequence needs it
    def oriented(df: DataFrame, rev: Boolean, dropLoops: Boolean): DataFrame = {
      // a self-loop's reversed copy is identical to its forward copy —
      // keeping both would double-count every path through it (the
      // reference's DFS visits a loop edge once; dfs.c get_next_vertex)
      val base = if (dropLoops)
        df.filter(col(s"${e}__start_id") =!= col(s"${e}__end_id")) else df
      if (!rev) base.select(col(s"${e}__id").as("eid"),
        col(s"${e}__start_id").as("src"), col(s"${e}__end_id").as("dst"),
        col(s"${e}__start_id").as("ostart"))
      else base.select(col(s"${e}__id").as("eid"),
        col(s"${e}__end_id").as("src"), col(s"${e}__start_id").as("dst"),
        col(s"${e}__start_id").as("ostart"))
    }
    // r16 endpoint-label branch pruning (guide §2.4 — remove work before
    // the join): hop 1 can only traverse oriented branches whose SOURCE
    // label matches prev's single pattern label, and the final hop
    // (k == hi) only branches whose DESTINATION label matches next's —
    // a frontier row produced by hop `hi` is only ever emitted, never
    // extended, and a dst whose packed label prefix differs from next's
    // label could never join next's label scan anyway. GraphBuilder
    // graphs declare endpoints per edge label (the packing guarantees
    // them), so mismatched branches drop out of the hop's scan AND join
    // entirely — whole edge tables, which is the 100 TB-relevant saving.
    // Graphs without the metadata, multi-label endpoints, pre-bound next
    // (its id-equality filter decides, not the pattern label), or
    // prop-filtered VLE relations take the single unpruned union scan —
    // exactly the pre-r16 shape. Correctness never depends on the prune.
    val branches: Seq[(Boolean, Boolean, DataFrame)] = {
      def single(ls: List[String]): Option[String] =
        ls match { case l :: Nil => Some(l); case _ => None }
      val prevLab = single(prevLabels)
      val nextLab = if (ctx.vars.contains(next)) None else single(node.labels)
      val types = if (rel.types.nonEmpty) rel.types
        else graph.edgeLabels.keys.toSeq.sorted.toList
      val meta = graph.edgeEndpoints
      if (rel.props.nonEmpty || meta.isEmpty || types.isEmpty ||
          (prevLab.isEmpty && nextLab.isEmpty)) {
        val scan0 = edgeScan(e, rel.types, rel.props, ctx)
        rel.dir match {
          case 1 => Seq((true, true, oriented(scan0, rev = false, dropLoops = false)))
          case -1 => Seq((true, true, oriented(scan0, rev = true, dropLoops = false)))
          case _ => Seq(
            (true, true, oriented(scan0, rev = false, dropLoops = false)),
            (true, true, oriented(scan0, rev = true, dropLoops = true)))
        }
      } else types.flatMap { t =>
        val scanT = edgeScan(e, List(t), Map.empty, ctx)
        val ends = meta.get(t) // unknown endpoints → participates everywhere
        def fits(lab: Option[String], branchEnd: Option[String]) =
          lab.isEmpty || branchEnd.isEmpty || lab == branchEnd
        val fwd = (fits(prevLab, ends.map(_._1)), fits(nextLab, ends.map(_._2)),
          oriented(scanT, rev = false, dropLoops = false))
        val rev = (fits(prevLab, ends.map(_._2)), fits(nextLab, ends.map(_._1)),
          oriented(scanT, rev = true, dropLoops = rel.dir == 0))
        rel.dir match {
          case 1 => Seq(fwd)
          case -1 => Seq(rev)
          case _ => Seq(fwd, rev)
        }
      }
    }
    def edgeUnion(first: Boolean, last: Boolean): DataFrame =
      branches.collect {
        case (f, l, df) if (!first || f) && (!last || l) => df
      } match {
        case Nil => branches.head._3.limit(0)
        case xs => xs.reduce(_ unionByName _)
      }
    // Interior hops (1 < k < hi) reuse the full union; checkpoint it only
    // when MORE THAN ONE hop actually reads it (eager job otherwise wasted
    // — the pre-r16 unconditional checkpoint paid a full edge-union
    // materialization even for *1..1). The unbounded loop re-joins it
    // every generation, so there it always checkpoints.
    val interiorUses = if (hi <= VleMaxHops) math.max(0, hi - 2) else hi
    lazy val interior: DataFrame =
      if (interiorUses > 1) edgeUnion(first = false, last = false).localCheckpoint()
      else edgeUnion(first = false, last = false)
    def edgesFor(k: Int): DataFrame =
      if (k == 1 || k == hi) edgeUnion(first = k == 1, last = k == hi)
      else interior

    // Narrow frontier: only (row id, traversal end, edge set) travels
    // through the hop joins — the input row's other columns rejoin once at
    // the end by rid, so each hop's shuffle carries 3 columns instead of
    // the whole binding row (the width matters at depth × 100 TB).
    val rid = "__vle_rid"
    val tagged = ctx.df.withColumn(rid, monotonically_increasing_id())
      .localCheckpoint() // freeze ids: both the expansion and the rejoin see the same values
    // the frontier also carries the VISITED NODE id sequence — one extra
    // long array per row, still narrow; it is what makes nodes(p) /
    // relationships(p) over the traversal reconstructible later (for
    // undirected hops the orientation is not recoverable from edge ids)
    var frontier = tagged
      .select(col(rid), col(s"${prev}__id").as("__vle_end"),
        array().cast(ArrayType(LongType)).as("__vle_edges"),
        array(col(s"${prev}__id")).as("__vle_nodes"))
    var results: DataFrame = null
    // hop 1 records its true arrival; later hops record the DISPLAY vertex
    // (the edge's original start — see `ostart` above); the true position
    // always travels in __vle_end
    def hop(f: DataFrame, k: Int): DataFrame = f
      .join(edgesFor(k), col("__vle_end") === col("src") &&
        !array_contains(col("__vle_edges"), col("eid")))
      .select(col(rid), col("dst").as("__vle_end"),
        array_append(col("__vle_edges"), col("eid")).as("__vle_edges"),
        array_append(col("__vle_nodes"),
          if (k == 1) col("dst") else col("ostart")).as("__vle_nodes"))
    // a generation entering the result set seals its LAST node back to the
    // true arrival — the reference materializes path ENDPOINTS correctly,
    // only interiors carry the display defect
    def seal(f: DataFrame): DataFrame = f.withColumn("__vle_nodes",
      concat(slice(col("__vle_nodes"), lit(1), size(col("__vle_nodes")) - 1),
        array(col("__vle_end"))))
    if (hi <= VleMaxHops) {
      // small bound: unroll lazily — one plan, no per-hop actions
      var k = 1
      while (k <= hi) {
        frontier = hop(frontier, k)
        if (k >= lo1) {
          val gen = seal(frontier)
          results = if (results == null) gen else results.unionByName(gen)
        }
        k += 1
      }
    } else {
      // large/unbounded bound: a 200-deep lazy unroll would explode the
      // analyzer — materialize each generation (flat plan, fresh attr ids)
      // and stop the moment a frontier empties (edge uniqueness guarantees
      // that within |E| hops). Liveness comes from count() over the
      // partitions the eager checkpoint just cached — the old
      // `!frontier.isEmpty` probe re-derived a limit(1) plan and ran a
      // second full job per generation (VERDICT r7 #4; same fix as the
      // BFS loop, Algorithms.scala level pattern).
      frontier = frontier.localCheckpoint()
      var k = 1
      var live = frontier.count() > 0
      while (live && k <= hi) {
        frontier = hop(frontier, k).localCheckpoint()
        live = frontier.count() > 0
        if (live && k >= lo1) {
          val gen = seal(frontier)
          results = if (results == null) gen else results.unionByName(gen)
        }
        k += 1
      }
    }
    // frontier died before `lo` hops → no qualifying paths (empty, not error)
    if (results == null) results = frontier.limit(0)
    val withVar = tagged.join(results, rid).drop(rid)
      .withColumnRenamed("__vle_edges", s"${relAlias}__ids")
      .withColumnRenamed("__vle_nodes", s"${relAlias}__nids")
    // join the far node
    val scanNext =
      if (ctx.vars.contains(next)) null
      else vertexScan(next, node.labels, node.props, ctx)
    val joined =
      if (scanNext == null)
        withVar.filter(col("__vle_end") === col(s"${next}__id")).drop("__vle_end")
      else withVar.join(scanNext, col("__vle_end") === col(s"${next}__id")).drop("__vle_end")
    Ctx(joined,
      ctx.vars + (relAlias -> VarInfo.vlePath) ++
        (if (ctx.vars.contains(next)) Nil else Seq(next -> VarInfo.vertex)),
      ctx.projected)
  }

  // ------------------------------------------------------------------ UNWIND

  private def compileUnwind(ctx: Ctx, u: Unwind): Ctx = {
    val c = compileExpr(u.expr, ctx)
    val df0 = if (ctx.df == null) spark.range(1).toDF("__seed") else ctx.df
    // openCypher: UNWIND of a non-list value yields that single value;
    // UNWIND null/missing yields no rows (explode of a null array)
    // dynamic (gtype) value: a gtype ARRAY explodes into promoted
    // elements, scalars yield themselves, null yields no rows — the alias
    // stays a dynamic value so a second UNWIND nests (cypher_unwind.sql
    // `UNWIND nested AS x UNWIND x AS y`)
    dataTypeOpt(c, ctx.copy(df = df0)) match {
      case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
        val df = df0
          .withColumn("__uwe", explode(graft.gvalue.GValueCol.unwindElems(c)))
          .withColumn(u.alias, graft.gvalue.GValueCol.promoteScalar(col("__uwe")))
          .drop("__uwe", "__seed")
        return Ctx(df, ctx.vars + (u.alias -> VarInfo.scalar), ctx.projected)
      case _ => ()
    }
    val arr = dataTypeOpt(c, ctx.copy(df = df0)) match {
      case Some(_: ArrayType) => c
      case Some(org.apache.spark.sql.types.NullType) =>
        lit(null).cast(ArrayType(org.apache.spark.sql.types.NullType))
      case _ => when(c.isNotNull, array(c))
    }
    // UNWIND over collected entities rebinds the alias as a FULL entity
    // variable (flat `alias__` columns, the same shape MATCH binds), so
    // SET/CREATE/RETURN through the collect→UNWIND round trip update the
    // store (cypher_unwind.sql:44-80; the reference flows the entity
    // through its generic update path, cypher_set.c:100-176). Only the
    // flat collect shape qualifies — path-member structs carry a
    // `properties` map and stay scalar values.
    dataTypeOpt(arr, ctx.copy(df = df0)) match {
      case Some(ArrayType(st: StructType, _))
          if st.fieldNames.contains("id") && st.fieldNames.contains("label") &&
            !st.fieldNames.contains("properties") =>
        var df = df0.withColumn("__uw", explode(arr))
        st.fieldNames.foreach { f =>
          df = df.withColumn(s"${u.alias}__$f", col("__uw").getField(f))
        }
        df = df.drop("__uw", "__seed")
        // derived: a VALUE round-tripped entity — readable/joinable/
        // CREATE-able, but the reference refuses SET/REMOVE on it
        // ("SET clause can only update vertex and edges",
        // cypher_unwind.out:89)
        val kind = VarInfo(
          if (st.fieldNames.contains("start_id")) VarKind.Edge else VarKind.Vertex,
          derived = true)
        return Ctx(df, ctx.vars + (u.alias -> kind), ctx.projected)
      case _ => ()
    }
    val df = df0.withColumn(u.alias, explode(arr)).drop("__seed")
    Ctx(df, ctx.vars + (u.alias -> VarInfo.scalar), ctx.projected)
  }

  // -------------------------------------------------------- RETURN/WITH body

  private def compileProjection(ctx0: Ctx, items0: List[ReturnItem],
      distinct: Boolean, orderBy: List[SortItem], skip: Option[Expr],
      limit: Option[Expr], where: Option[Expr], isReturn: Boolean,
      partitionCol: Option[String] = None, group: Option[GroupSpec] = None,
      windows: Map[String, WindowDef] = Map.empty): Ctx = {
    var ctx = if (ctx0.df == null) ctx0.copy(df = spark.range(1).toDF("__seed")) else ctx0

    // RETURN * / WITH * expansion
    val items = items0.flatMap {
      case ReturnItem(Var("*"), _) =>
        ctx.vars.keys.filterNot(_.startsWith("_anon")).toSeq.sorted
          .map(v => ReturnItem(Var(v), None))
      case other => List(other)
    }.map { it =>
      // resolve named windows (`OVER w`) against the clause's WINDOW list
      it.copy(expr = rewriteExpr(it.expr) {
        case WindowCall(fn, Left(w)) =>
          WindowCall(fn, Right(windows.getOrElse(w, throw new
            IllegalArgumentException(s"window \"$w\" does not exist"))))
      })
    }

    // traversal values for any VLE var referenced by the projection
    ctx = ensureVleValues(ctx,
      items.map(_.expr) ++ orderBy.map(_.expr) ++ where.toList)

    // IVFFlat index probe: `… ORDER BY v.prop <-> <const vector> LIMIT k`
    // over an indexed vertex property restricts the scan to the probed
    // lists' candidates BEFORE the top-k sort — approximate, exactly like
    // the reference planner choosing the ivfflat access method for this
    // shape (ivfutils.c; recall governed by ivfflat.probes). Rows of other
    // labels (id prefix ≠ the indexed label) pass through untouched.
    (orderBy, limit) match {
      case (List(SortItem(IvfDistShape(v, p, metric, vec), false, _)), Some(_))
          if ctx.df != null &&
            ctx.vars.get(v).exists(_.kind == VarKind.Vertex) =>
        graph.ivfProbe(Compiler.PropNames.esc(p), metric, vec).foreach {
          case (lid, cand) =>
            val c = broadcast(cand.select(col("id").as("__ivf_id")))
            ctx = ctx.copy(df = ctx.df
              .join(c, col(s"${v}__id") === col("__ivf_id"), "left_outer")
              .filter(shiftrightunsigned(col(s"${v}__id"), 48) =!= lid ||
                col("__ivf_id").isNotNull)
              .drop("__ivf_id"))
        }
      case _ => ()
    }

    // sublinks in RETURN/WITH items or sort keys → derived boolean columns
    // (pre-projection scope; the projection's select drops the helpers)
    val (boundCtx, boundExprs, _) =
      bindSublinks(ctx, items.map(_.expr) ++ orderBy.map(_.expr))
    ctx = boundCtx
    val (itemEs, orderEs) = boundExprs.splitAt(items.length)
    val boundItems = items.zip(itemEs).map { case (it, e) => it.copy(expr = e) }
    val boundOrder = orderBy.zip(orderEs).map { case (s, e) => s.copy(expr = e) }

    // name each item
    def autoName(e: Expr): String = e match {
      case Var(n)           => n
      case Prop(Var(n), k)  => s"$n.$k"
      case _                => s"expr${boundItems.indexWhere(_.expr == e)}"
    }
    val named = boundItems.map(it => (it.alias.getOrElse(autoName(it.expr)), it.expr))

    val hasAgg = group.isEmpty &&
      named.exists { case (_, e) => containsAggregate(e) }

    // the reference validates agg-containing items up front: every
    // maximal NON-aggregate subexpression must syntactically BE one of
    // the listed key items — a variable reached outside both raises its
    // transform error (old aggregation.out:640-700 `"x" must be either
    // part of an explicitly listed key or used inside an aggregate
    // function`)
    if (hasAgg && partitionCol.isEmpty) {
      val keyExprs: Set[Expr] =
        named.collect { case (_, e) if !containsAggregate(e) => e }.toSet
      def isAggNode(e: Expr): Boolean = e match {
        case FnCall(name, _, _) => AggFns(name) || TwoColStatAggs(name)
        case CountStar() | AggFilter(_, _) | WithinGroup(_, _, _) => true
        case _ => false
      }
      def walk(e: Expr): Unit = e match {
        case _ if keyExprs.contains(e) => ()
        case _ if isAggNode(e) => ()
        case WindowCall(_, _) => ()
        case Var(n) if ctx.vars.contains(n) =>
          throw new IllegalArgumentException(s""""$n" must be either part """ +
            "of an explicitly listed key or used inside an aggregate function")
        case p: Product => p.productIterator.foreach {
          case sub: Expr => walk(sub)
          case xs: Iterable[_] => xs.foreach {
            case sub: Expr => walk(sub)
            case (_, sub: Expr) => walk(sub)
            case _ => ()
          }
          case Some(sub: Expr) => walk(sub)
          case _ => ()
        }
        case _ => ()
      }
      named.foreach { case (_, e) => if (containsAggregate(e)) walk(e) }
    }

    var outVars = ListMap.empty[String, VarInfo]
    var df = ctx.df

    var hiddenSort = List.empty[String]
    if (group.isDefined) {
      // Explicit `GROUP BY [ROLLUP|CUBE] keys [HAVING pred]` (reference
      // unified grammar; old regress aggregation.sql:264-337). Two-phase:
      // aggregate the collected maximal aggregate subtrees alongside the
      // key expressions, then evaluate each item over (__gk*, __agg*) —
      // identical duplicate aggregates share one column, and an item
      // referencing a non-key non-aggregate column fails to resolve, which
      // is the reference's "must be part of an explicitly listed key or
      // used inside an aggregate" error.
      val g = group.get
      val keys = g.keys
      def isAggNode(e: Expr): Boolean = e match {
        case FnCall(n, _, _) => AggFns(n)
        case CountStar() | WithinGroup(_, _, _) | AggFilter(_, _) => true
        case _ => false
      }
      val aggs = scala.collection.mutable.ListBuffer.empty[Expr]
      def collectAggs(e: Expr): Unit = { rewriteExpr(e) {
        case k if keys.contains(k) => k // stop: key subtree
        case a if isAggNode(a) => if (!aggs.contains(a)) aggs += a; a
      }; () }
      named.foreach { case (_, e) => collectAggs(e) }
      g.having.foreach(collectAggs)
      val keyCols = keys.zipWithIndex.map { case (k, i) =>
        compileExpr(k, ctx).as(s"__gk$i") }
      val aggCols = aggs.toList.zipWithIndex.map { case (a, j) =>
        compileAggExpr(a, ctx).as(s"__agg$j") }
      val gd = g.kind match {
        case "rollup" => ctx.df.rollup(keyCols: _*)
        case "cube"   => ctx.df.cube(keyCols: _*)
        case "sets" =>
          // GROUPING SETS — materialize the key exprs as named columns
          // first so each set references plain attributes (Spark matches
          // set elements against grouping columns by expression equality,
          // which aliased key exprs would defeat), then one Expand via
          // Dataset.groupingSets.
          val keyed = ctx.df.select(col("*") +: keyCols: _*)
          keyed.groupingSets(
            g.sets.map(_.map(k => col(s"__gk${keys.indexOf(k)}"))),
            keys.indices.map(i => col(s"__gk$i")): _*)
        case _        => ctx.df.groupBy(keyCols: _*)
      }
      var adf =
        if (aggCols.isEmpty) gd.agg(count(lit(1)).as("__gcnt"))
        else gd.agg(aggCols.head, aggCols.tail: _*)
      def subst(e: Expr): Expr = rewriteExpr(e) {
        case k if keys.indexOf(k) >= 0 => Var(s"__gk${keys.indexOf(k)}")
        case a if aggs.indexOf(a) >= 0 => Var(s"__agg${aggs.indexOf(a)}")
      }
      g.having.foreach { h =>
        adf = adf.filter(compileExpr(subst(h),
          Ctx(adf, ListMap.empty, projected = false)))
      }
      val postCtx = Ctx(adf, ListMap.empty, projected = false)
      df = adf.select(named.map { case (n, e) =>
        compileExpr(subst(e), postCtx).as(n) }: _*)
      named.foreach { case (n, _) => outVars += (n -> VarInfo.scalar) }
    } else if (!hasAgg) {
      // plain projection; entity vars keep their flat columns (renamed)
      val cols = scala.collection.mutable.ListBuffer.empty[Column]
      named.foreach {
        case (name, Var(v)) if ctx.vars.get(v).exists(_.isEntity) =>
          val info = ctx.vars(v)
          entityColumns(ctx.df, v).foreach { c =>
            cols += col(c).as(s"${name}__${c.stripPrefix(s"${v}__")}")
          }
          outVars += (name -> info)
        case (name, e) =>
          val c = compileExpr(e, ctx)
          // schema-underdetermined gtype kinds (time is a LONG, tsvector
          // an ARRAY<STRING>) carry a marker in the alias metadata so the
          // value surface (PgOut) and later clauses can re-dispatch
          cols += (typeMarker(e, ctx) match {
            case Some(m) => c.as(name, new MetadataBuilder()
              .putString(graft.gvalue.PgOut.TypeKey, m).build())
            case None => c.as(name)
          })
          outVars += (name -> VarInfo.scalar)
      }
      // ORDER BY may reference the pre-projection scope (`RETURN tostring(x)
      // AS s ORDER BY n.code`) — carry such sort keys through the projection
      // as hidden columns, dropped after the sort.
      if (boundOrder.nonEmpty) {
        // resolvability probe only — an EMPTY same-schema leaf instead of
        // the real frame, so the analyzer does not re-walk the accumulated
        // plan under the (possibly kernel-expanded) projection columns
        // (r17; sampled ~35% of g25's construction). The real projection
        // at the end of this branch still selects from ctx.df.
        lazy val tentative = ctx.df.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), ctx.df.schema)
          .select(cols.toSeq: _*)
        boundOrder.zipWithIndex.foreach { case (s, i) =>
          // ORDER BY a path value sorts by the interleaved (v, e, v, …)
          // id sequence (traversal.c:188-215 compare_traversal_orderability)
          // — the full value's properties maps are not orderable
          val pathKey = s.expr match {
            case Var(p) if ctx.vars.get(p).exists(_.kind == VarKind.Path) =>
              Some(pathOrderKey(p, ctx))
            case _ => None
          }
          // fast path (r17): a sort key that is simply one of the
          // projection's own output names resolves post-projection by
          // construction — no need to analyze the full projected frame
          // (for kernel-expanded projections that probe alone was ~20% of
          // construction time)
          val aliasSort = s.expr match {
            case Var(v) => outVars.contains(v)
            case _ => false
          }
          val postOk = pathKey.isEmpty && (aliasSort || scala.util.Try {
            val c = compileExpr(s.expr,
              Ctx(tentative, outVars, projected = true))
            tentative.select(c).schema
          }.isSuccess)
          if (!postOk) {
            val pre = pathKey.getOrElse(compileExpr(s.expr, ctx))
            cols += pre.as(s"__sort$i")
            hiddenSort ::= s"__sort$i"
          }
        }
      }
      df = df.select(cols.toSeq: _*)
    } else {
      // implicit grouping: non-aggregate items are the grouping keys
      // (reference: cypher_item.c:169-240 / cypher_parse_agg.c); items
      // aggregate under positional temp names so duplicate aliases and
      // textually identical aggregates (`collect(x), collect(x)`) stay
      // unambiguous, then the final select restores order + display names
      val indexed = named.zipWithIndex
      val keyItems = indexed.filter { case ((_, e), _) => !containsAggregate(e) }
      val aggItems = indexed.filter { case ((_, e), _) => containsAggregate(e) }
      val keyCols = keyItems.map { case ((_, e), i) => compileExpr(e, ctx).as(s"__p$i") }
      val aggCols = aggItems.map { case ((_, e), i) => compileAggExpr(e, ctx).as(s"__p$i") }
      df = if (keyCols.isEmpty) ctx.df.agg(aggCols.head, aggCols.tail: _*)
      else ctx.df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      df = df.select(indexed.map { case ((n, _), i) => col(s"__p$i").as(n) }: _*)
      named.foreach { case (n, _) => outVars += (n -> VarInfo.scalar) }
    }

    if (distinct) {
      // hidden sort keys must not affect DISTINCT semantics
      val keep = df.columns.filterNot(hiddenSort.contains).toSeq
      // Spark cannot set-operate on MapType (entity properties inside
      // path/entity values) — substitute a canonical JSON key for any
      // map-bearing column (path identity is its id sequence, but the
      // full value key is equality-exact for all of them)
      def hasMap(dt: DataType): Boolean = dt match {
        case _: MapType => true
        case st: StructType => st.fields.exists(f => hasMap(f.dataType))
        case ArrayType(et, _) => hasMap(et)
        case _ => false
      }
      val mapCols = keep.filter(c => hasMap(df.schema(c).dataType))
      if (mapCols.isEmpty) df = df.dropDuplicates(keep)
      else {
        val keyed = mapCols.foldLeft(df)((d, c) =>
          d.withColumn(s"__dk_$c", to_json(col(c))))
        df = keyed.dropDuplicates(
          keep.filterNot(mapCols.contains) ++ mapCols.map(c => s"__dk_$c"))
          .drop(mapCols.map(c => s"__dk_$c"): _*)
      }
    }

    val postCtx = Ctx(df, outVars, projected = true)
    where.foreach { wc =>
      // WITH … WHERE may itself hold sublinks (post-projection scope)
      val postOk = scala.util.Try {
        val (wCtx, ws, _) = bindSublinks(postCtx.copy(df = df), Seq(wc))
        wCtx.df.filter(compileExpr(ws.head, wCtx)).schema
      }.isSuccess
      if (!postOk && !hasAgg) {
        // `WITH n AS a WHERE n.i = 1` — the predicate may reference the
        // PRE-projection scope (cypher_with.sql:44-51): filter the input
        // first and re-run the projection (equivalent for non-aggregating
        // WITH, where the predicate is row-local)
        val (wCtx, ws, added) = bindSublinks(ctx, Seq(wc))
        val filtered = wCtx.df.filter(compileExpr(ws.head, wCtx)).drop(added: _*)
        return compileProjection(ctx.copy(df = filtered), items0, distinct,
          orderBy, skip, limit, where = None, isReturn, partitionCol,
          group, windows)
      }
      val (wCtx, ws, added) = bindSublinks(postCtx.copy(df = df), Seq(wc))
      df = wCtx.df.filter(compileExpr(ws.head, wCtx)).drop(added: _*)
    }

    val sortCols = boundOrder.zipWithIndex.map { case (s, i) =>
      val c0 =
        if (hiddenSort.contains(s"__sort$i")) col(s"__sort$i")
        else compileExpr(s.expr, postCtx.copy(df = df))
      // dynamic values order by the gtype cross-type key
      val c = dataTypeOpt(c0, postCtx.copy(df = df)) match {
        case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
          graft.gvalue.GValueCol.orderKey(c0)
        case _ => c0
      }
      val dir = if (s.descending) c.desc else c.asc
      s.nullsFirst match {
        case Some(true)  => if (s.descending) c.desc_nulls_first else c.asc_nulls_first
        case Some(false) => if (s.descending) c.desc_nulls_last else c.asc_nulls_last
        case None        => dir
      }
    }
    partitionCol match {
      case None =>
        if (sortCols.nonEmpty) df = df.orderBy(sortCols: _*)
        skip.foreach(e => df = df.offset(constInt(e).toInt))
        limit.foreach(e => df = df.limit(constInt(e).toInt))
      case Some(p) if sortCols.nonEmpty || skip.nonEmpty || limit.nonEmpty =>
        // per-group semantics (correlated CALL {}): ORDER/SKIP/LIMIT apply
        // within each outer row's partition — a row_number window, not a
        // global sort (reference: the lateral subquery re-executes per
        // outer row; here one windowed pass serves every row)
        import org.apache.spark.sql.expressions.Window
        val order = if (sortCols.nonEmpty) sortCols else Seq(col(p).asc)
        val w = Window.partitionBy(col(p)).orderBy(order: _*)
        df = df.withColumn("__pp_rn", row_number().over(w))
        val lo = skip.map(constInt).getOrElse(0L)
        if (lo > 0) df = df.filter(col("__pp_rn") > lo)
        limit.foreach(l => df = df.filter(col("__pp_rn") <= lo + constInt(l)))
        df = df.drop("__pp_rn")
      case _ => ()
    }
    if (hiddenSort.nonEmpty) df = df.drop(hiddenSort: _*)

    Ctx(df, outVars, projected = true)
  }

  private def constInt(e: Expr): Long = e match {
    case Lit(GInt(v)) => v
    case Param(n) => params.get(n) match {
      case Some(GInt(v)) => v
      case other => throw new IllegalArgumentException(s"parameter $n is not an integer: $other")
    }
    case other => throw new UnsupportedOperationException(s"SKIP/LIMIT must be a literal, got $other")
  }

  private def entityColumns(df: DataFrame, v: String): Seq[String] =
    // gsrc/gdst are bind-time orientation internals of the undirected
    // edge scan, not entity state — they never belong to the value
    df.columns.filter(c => c.startsWith(s"${v}__") &&
      c != s"${v}__gsrc" && c != s"${v}__gdst").toSeq

  // -------------------------------------------------------------- expressions

  /** All-literal list with more than one scalar type (ignoring nulls)? */
  private def mixedLitTags(items: List[Expr]): Boolean =
    items.nonEmpty && items.forall(_.isInstanceOf[Lit]) && {
      val tags = items.collect { case Lit(g) if g != GNull => g.getClass }.distinct
      tags.size > 1
    }

  /** Literal (possibly one-level-nested) GValue of an expression. */
  private def litGValue(e: Expr): Option[GValue] = Compiler.litGValue(e)

  private def isScalarG(g: GValue): Boolean = g match {
    case _: GArray | _: GMap | _: GVector => false
    case _ => true
  }

  /** A literal list that needs the DYNAMIC encoding: mixed scalar classes
    * at the top level, or any nested list/object element.
    */
  private def heteroLitList(items: List[Expr]): Option[List[GValue]] = {
    val gs = items.map(litGValue)
    if (!gs.forall(_.isDefined)) return None
    val vals = gs.map(_.get)
    val classes = vals.filter(_ != GNull).map {
      case _: GArray | _: GMap => classOf[GArray]: Class[_]
      case v => v.getClass: Class[_]
    }.distinct
    if (classes.size > 1) return Some(vals)
    // single-class CONTAINER lists still need the dynamic form unless
    // every element is an array of ONE scalar class ([[1,2],[3]] stays a
    // typed array<array<long>>; [['s'], [1, [2]], null] cannot —
    // lists.sql:37's three-level literal)
    def scalarElemClass(v: GValue): Option[Class[_]] = v match {
      case GArray(xs) if xs.nonEmpty && xs.forall(isScalarG) &&
          !xs.contains(GNull) && xs.map(_.getClass).distinct.size == 1 =>
        Some(xs.head.getClass)
      case _ => None
    }
    if (classes.headOption.contains(classOf[GArray]: Class[_])) {
      val ecs = vals.filter(_ != GNull).map(scalarElemClass)
      val uniformTyped = ecs.forall(_.isDefined) &&
        ecs.flatten.distinct.size == 1 && !vals.contains(GNull)
      if (!uniformTyped) return Some(vals)
    }
    None
  }

  private def containsAggregate(e: Expr): Boolean = e match {
    case FnCall(name, args, _) =>
      AggFns(name) || TwoColStatAggs(name) || args.exists(containsAggregate)
    case CountStar()       => true
    // a window call is row-scoped, not a grouping aggregate — even when the
    // windowed function is itself an aggregate (`sum(x) OVER w`)
    case WindowCall(_, _)  => false
    case AggFilter(_, _)   => true
    case WithinGroup(_, _, _) => true
    case Bin(_, l, r)      => containsAggregate(l) || containsAggregate(r)
    case Un(_, x)          => containsAggregate(x)
    case IsNull(x, _)      => containsAggregate(x)
    case StringOp(_, l, r) => containsAggregate(l) || containsAggregate(r)
    case CaseExpr(op, whens, otherwise) =>
      op.exists(containsAggregate) ||
        whens.exists(w => containsAggregate(w._1) || containsAggregate(w._2)) ||
        otherwise.exists(containsAggregate)
    case Index(b, i) => containsAggregate(b) || containsAggregate(i)
    case _ => false
  }

  /** Pre-order expression rewrite: `f` is tried at each node before its
    * children; where it applies, the replacement subtree is NOT revisited
    * (so whole-subtree substitutions — group keys, aggregate extraction —
    * match maximally).
    */
  private def rewriteExpr(e: Expr)(f: PartialFunction[Expr, Expr]): Expr =
    if (f.isDefinedAt(e)) f(e)
    else {
      val rec: Expr => Expr = rewriteExpr(_)(f)
      def recSort(ss: List[SortItem]) = ss.map(s => s.copy(expr = rec(s.expr)))
      e match {
        case Bin(op, l, r)      => Bin(op, rec(l), rec(r))
        case Un(op, x)          => Un(op, rec(x))
        case IsNull(x, n)       => IsNull(rec(x), n)
        case StringOp(op, l, r) => StringOp(op, rec(l), rec(r))
        case FnCall(n, args, d) => FnCall(n, args.map(rec), d)
        case Prop(b, k)         => Prop(rec(b), k)
        case ListLit(xs)        => ListLit(xs.map(rec))
        case MapLit(es)         => MapLit(es.map { case (k, v) => (k, rec(v)) })
        case CaseExpr(op, whens, ow) => CaseExpr(op.map(rec),
          whens.map { case (a, b) => (rec(a), rec(b)) }, ow.map(rec))
        case Index(b, i)        => Index(rec(b), rec(i))
        case Slice(b, lo, hi)   => Slice(rec(b), lo.map(rec), hi.map(rec))
        case WindowCall(fn, over) => WindowCall(rec(fn), over match {
          case Right(wd) => Right(WindowDef(wd.partitionBy.map(rec),
            recSort(wd.orderBy), wd.frame))
          case l => l
        })
        case AggFilter(a, p)       => AggFilter(rec(a), rec(p))
        case WithinGroup(n, as, o) => WithinGroup(n, as.map(rec), recSort(o))
        case other => other
      }
    }

  /** Compile an expression that contains aggregate calls (agg context). */
  private def compileAggExpr(e: Expr, ctx: Ctx): Column = e match {
    case CountStar() => count(lit(1))
    case FnCall(name, args, dist) if AggFns(name) =>
      compileAggFn(name, args, dist, ctx, filter = None)
    case AggFilter(agg, pred) =>
      // `agg(...) FILTER (WHERE p)` — rows failing p are excluded from the
      // aggregate. Compiled by null-masking each argument (every aggregate
      // here is null-skipping), keeping the aggregation single-pass.
      val p = compileExpr(pred, ctx)
      agg match {
        case CountStar() => count(when(p, lit(1)))
        case FnCall(name, args, dist) if AggFns(name) =>
          compileAggFn(name, args, dist, ctx, filter = Some(p))
        case WithinGroup(fn, args, ord) =>
          compileWithinGroup(fn, args, ord, ctx, filter = Some(p))
        case other => throw new UnsupportedOperationException(
          s"FILTER on a non-aggregate: $other")
      }
    case WithinGroup(fn, args, ord) =>
      compileWithinGroup(fn, args, ord, ctx, filter = None)
    case Bin(op, l, r) => binOp(op, compileAggExpr(l, ctx), compileAggExpr(r, ctx), ctx)
    case FnCall(name, args, _) if !AggFns(name) && args.exists(containsAggregate) =>
      // scalar function over an aggregate result: size(collect(…)) etc.
      compileFn(name, args, ctx, inAgg = true)
    case other => compileExpr(other, ctx)
  }

  private def compileAggFn(name: String, args: List[Expr], dist: Boolean,
      ctx: Ctx, filter: Option[Column]): Column = {
    // FILTER masks the aggregated value to null on excluded rows; literal
    // extra args (collect's limit, percentile's fraction) stay unmasked
    def masked(c: Column): Column = filter.map(f => when(f, c)).getOrElse(c)
    val a0 = args.map(x => compileExpr(x, ctx))
    // numeric aggregates over a heterogeneous (dynamic) property column
    // decode the numeric payload — non-numeric rows aggregate as null,
    // matching the reference's gtype agg transfns skipping them
    def num(c: Column): Column = dataTypeOpt(c, ctx) match {
      case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
        graft.gvalue.GValueCol.numeric(c)
      case _ => c
    }
    val numericAgg = Set("sum", "avg", "stdev", "stdevp",
      "percentilecont", "percentiledisc")
    val a1 = if (numericAgg(name) && a0.nonEmpty) num(a0.head) :: a0.tail else a0
    val a = if (a1.isEmpty) a1 else masked(a1.head) :: a1.tail
    // agg null-skipping over DYNAMIC values must skip SQL null AND the
    // gtype null — both order as the LARGEST family (11), so a bare
    // max_by key would pick an absent property over every real value
    // (aggregation.out max(u.gpa)). A null KEY makes min_by/max_by skip
    // the row.
    def gKey(v: Column): Column =
      when(v.isNotNull && !graft.gvalue.GValueCol.isNullVal(v),
        graft.gvalue.GValueCol.orderKey(v))
    name match {
      case "count"   => if (dist) countDistinct(a.head) else count(a.head)
      case "sum"     => dataTypeOpt(a.head, ctx) match {
        // the reference's float sum transfn accumulates NUMERIC
        // (aggregation.out `sum(u.gpa)` → 24.45::numeric); each addend
        // converts at its shortest double text, so the decimal sum is
        // exact where a double sum drifts
        case Some(DoubleType | FloatType) =>
          sum(a.head.cast(DecimalType(38, 18)))
        case _ => sum(a.head)
      }
      case "avg"     => avg(a.head)
      case "min"     => // dynamic values order by the gtype key, not struct-lex
        dataTypeOpt(a.head, ctx) match {
          case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
            min_by(a.head, gKey(a.head))
          case _ => min(a.head)
        }
      case "max"     =>
        dataTypeOpt(a.head, ctx) match {
          case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
            max_by(a.head, gKey(a.head))
          case _ => max(a.head)
        }
      case "collect" =>
        val full0 = if (dist) collect_set(a.head) else collect_list(a.head)
        // zero accumulated rows → SQL NULL, not []: the reference's
        // internal-state aggregate never runs its transfn so PG skips the
        // strict final and returns NULL (gtype_collect_aggfinalfn,
        // gtype.c:2669; old aggregation.out:373-381 blank cell)
        val full = when(size(full0) === 0, lit(null)).otherwise(full0)
        // 2-arg form caps the result (vertex/edge/gtype_collect_transfn_w_limit,
        // postgraph-aggregation.sql.in:294-334)
        if (a.length >= 2) slice(full, lit(1), a(1).cast("int")) else full
      case "stdev"   => stddev_samp(a.head)
      case "stdevp"  => stddev_pop(a.head)
      case "percentilecont" => call_function("percentile", a.head, a(1))
      case "percentiledisc" =>
        // discrete percentile, exact: smallest value with cume_dist >= p =
        // sorted element at ceil(p * n) (reference: gtype_percentile_
        // aggtransfn/discfinalfn, gtype.c:2427-2632); null-skipping matches
        // via collect_list/count-of-column
        element_at(sort_array(collect_list(a.head)),
          greatest(ceil(count(a.head) * a(1)), lit(1)).cast("int"))
    }
  }

  /** `fn(args) OVER (PARTITION BY … ORDER BY … [frame])` → the Spark
    * Window API (reference: PG window functions via the unified grammar,
    * old regress aggregation.sql:343-485). Ranking/offset functions map
    * 1:1; windowed aggregates reuse the aggregate kernels over the spec.
    * Scale: one shuffle on the partition keys per distinct window spec —
    * exactly the reference executor's sort-based windowing, distributed.
    */
  private def compileWindowCall(fn: Expr, wd: WindowDef, ctx: Ctx): Column = {
    import org.apache.spark.sql.expressions.Window
    val parts = wd.partitionBy.map(e => compileExpr(e, ctx))
    val sorts = wd.orderBy.map { s =>
      val c0 = compileExpr(s.expr, ctx)
      val c = dataTypeOpt(c0, ctx) match {
        case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
          graft.gvalue.GValueCol.orderKey(c0)
        case _ => c0
      }
      // PG defaults: ASC = NULLS LAST, DESC = NULLS FIRST
      s.nullsFirst match {
        case Some(true)  => if (s.descending) c.desc_nulls_first else c.asc_nulls_first
        case Some(false) => if (s.descending) c.desc_nulls_last else c.asc_nulls_last
        case None        => if (s.descending) c.desc_nulls_first else c.asc_nulls_last
      }
    }
    var w = Window.partitionBy(parts: _*)
    if (sorts.nonEmpty) w = w.orderBy(sorts: _*)
    // ranking/offset functions ignore any user frame (PG semantics: the
    // frame affects only value/aggregate window functions; Spark rejects a
    // non-default frame on them outright)
    val framed = fn match {
      case FnCall(n, _, _) => !Set("row_number", "rank", "dense_rank",
        "percent_rank", "cume_dist", "ntile", "lag", "lead")(n)
      case _ => true
    }
    if (framed) wd.frame.foreach { case (isRows, lo, hi) =>
      val l = lo.getOrElse(Window.unboundedPreceding)
      val h = hi.getOrElse(Window.unboundedFollowing)
      w = if (isRows) w.rowsBetween(l, h) else w.rangeBetween(l, h)
    }
    def litInt(e: Expr): Int = constInt(e).toInt
    val f = fn match {
      case CountStar() => count(lit(1))
      case AggFilter(_, _) | WithinGroup(_, _, _) =>
        throw new UnsupportedOperationException(
          "FILTER/WITHIN GROUP over a window is not supported")
      case FnCall(name, args, dist) =>
        lazy val a = args.map(x => compileExpr(x, ctx))
        name match {
          case "row_number"   => row_number()
          case "rank"         => rank()
          case "dense_rank"   => dense_rank()
          case "percent_rank" => percent_rank()
          case "cume_dist"    => cume_dist()
          case "ntile"        => ntile(litInt(args.head))
          case "lag" => args.length match {
            case 1 => lag(a.head, 1)
            case 2 => lag(a.head, litInt(args(1)))
            case _ => lag(a.head, litInt(args(1)), constLit(args(2)))
          }
          case "lead" => args.length match {
            case 1 => lead(a.head, 1)
            case 2 => lead(a.head, litInt(args(1)))
            case _ => lead(a.head, litInt(args(1)), constLit(args(2)))
          }
          case "first_value" => first(a.head)
          case "last_value"  => last(a.head)
          case "nth_value"   => nth_value(a.head, litInt(args(1)))
          case n if AggFns(n) => compileAggFn(n, args, dist, ctx, filter = None)
          case other => throw new UnsupportedOperationException(
            s"$other is not a window function")
        }
      case other => throw new UnsupportedOperationException(
        s"OVER on a non-function: $other")
    }
    f.over(w)
  }

  private def constLit(e: Expr): Any = e match {
    case Lit(v) => gValueToAny(v)
    case other => throw new UnsupportedOperationException(
      s"expected a literal, got $other")
  }

  /** `fn(args) WITHIN GROUP (ORDER BY keys)` — PG ordered-set /
    * hypothetical-set aggregates (reference: unified grammar; hypothetical
    * rank family per old regress aggregation.sql:495). The hypothetical
    * forms compute the rank a row built from `args` would take among the
    * group's rows ordered by `keys` — expressed as counting aggregates
    * over the lexicographic precedes/equals predicates, one pass, no sort.
    */
  private def compileWithinGroup(fn: String, args: List[Expr],
      order: List[SortItem], ctx: Ctx, filter: Option[Column]): Column = {
    def masked(c: Column): Column = filter.map(f => when(f, c)).getOrElse(c)
    val keys = order.map(s => compileExpr(s.expr, ctx))
    fn match {
      // ordered-set aggregates: the ORDER BY key is the aggregated column
      case "percentile_cont" | "percentilecont" =>
        call_function("percentile", masked(keys.head),
          compileExpr(args.head, ctx))
      case "percentile_disc" | "percentiledisc" =>
        val k = masked(keys.head)
        element_at(sort_array(collect_list(k)),
          greatest(ceil(count(k) * compileExpr(args.head, ctx)), lit(1)).cast("int"))
      case "mode" => mode(masked(keys.head))
      case "rank" | "dense_rank" | "percent_rank" | "cume_dist" =>
        // hypothetical-set: pair sort keys with the hypothetical args
        // positionally (extra args beyond the key list are ignored, as the
        // reference does — aggregation.out:1072 rank(x.i, x.j) w/ 1 key).
        // PG null ordering: ASC = NULLS LAST, DESC = NULLS FIRST.
        val pairs = order.zip(args).map { case (s, argE) =>
          val k = compileExpr(s.expr, ctx)
          val v = compileExpr(argE, ctx)
          val kPrecedes =
            if (s.descending) (k > v) || (k.isNull && v.isNotNull)
            else (k < v) || (v.isNull && k.isNotNull)
          val eq = (k === v) || (k.isNull && v.isNull)
          (kPrecedes, eq)
        }
        // lexicographic "row strictly precedes the hypothetical row"
        val precedes = pairs.foldRight(lit(false)) { case ((p, eq), rest) =>
          p || (eq && rest)
        }
        val nPrec = sum(when(masked(precedes), 1L).otherwise(0L))
        fn match {
          case "rank" => nPrec + lit(1)
          case "dense_rank" =>
            // distinct preceding key-tuples + 1
            countDistinct(when(masked(precedes),
              struct(keys: _*))) + lit(1)
          case "percent_rank" =>
            when(count(masked(lit(1))) === 0, lit(0.0))
              .otherwise(nPrec.cast("double") / count(masked(lit(1))))
          case "cume_dist" =>
            val precedesOrEq = pairs.foldRight(lit(true)) { case ((p, eq), rest) =>
              p || (eq && rest)
            }
            (sum(when(masked(precedesOrEq), 1L).otherwise(0L)) + lit(1))
              .cast("double") / (count(masked(lit(1))) + lit(1))
        }
      case other => throw new UnsupportedOperationException(
        s"WITHIN GROUP is not supported for $other")
    }
  }

  def compileExpr(e: Expr, ctx: Ctx): Column = e match {
    case Lit(v)   => litColumn(v)
    case Param(n) => litColumn(params.getOrElse(n,
      throw new IllegalArgumentException(
        // no params map at all = the reference's missing-argument error
        // (old expr.out `RETURN $var` without a third cypher() arg)
        if (params.isEmpty)
          "parameters argument is missing from cypher() function call"
        else s"missing parameter $$$n")))
    case WindowCall(fn, over) =>
      val wd = over match {
        case Right(d) => d
        case Left(w) => throw new IllegalArgumentException(
          s"window \"$w\" does not exist")
      }
      compileWindowCall(fn, wd, ctx)
    case Var(n) =>
      ctx.vars.get(n) match {
        case Some(info) if info.isEntity =>
          // whole-entity value → struct on the fly
          val cs = entityColumns(ctx.df, n)
          struct(cs.map(c => col(c).as(c.stripPrefix(s"${n}__"))): _*)
        case Some(info) if info.kind == VarKind.VlePath =>
          // RETURN e over a VLE var is the VariableEdge container —
          // [edge, vertex, edge, …, edge] with the INTERIOR vertices
          // between the edges (variable_edge.c:40-59 variable_edge_out
          // interleaves odd children; endpoints excluded). Spark-typed as
          // a (nodes, edges) struct pair like Path, nodes = interior only;
          // materialized by ensureVleValues before projection compiles
          require(ctx.df.columns.contains(s"${n}__edges") &&
            ctx.df.columns.contains(s"${n}__nodes"),
            s"VLE variable $n's traversal values were not materialized here")
          val ns = col(s"${n}__nodes")
          struct(slice(ns, lit(2), greatest(size(ns) - 2, lit(0))).as("nodes"),
            col(s"${n}__edges").as("edges"))
        case Some(info) if info.kind == VarKind.Path =>
          // RETURN p — the traversal value (traversal.c:64-120 builds the
          // interleaved vertex/edge varlena; the Spark-typed equivalent is
          // a (nodes, edges) struct pair, orderable for ORDER BY p via
          // traversal_ops-style sequence comparison)
          struct(pathMembers(Var(n), ctx, edges = false).as("nodes"),
            pathMembers(Var(n), ctx, edges = true).as("edges"))
        case _ =>
          // an identifier bound by NOTHING raises the reference's
          // transform error (old scan.out:439-469 `could not find rte
          // for <name>`) instead of Spark's unresolved-column analysis
          // error; names that DO resolve to a frame column (projection
          // aliases, helper columns) pass through
          if (ctx.df == null ||
            ctx.df.columns.exists(_.equalsIgnoreCase(n))) col(n)
          else throw new IllegalArgumentException(s"could not find rte for $n")
      }
    case e @ (Index(_, _) | Prop(_, _)) if constG(e).exists(_._2) =>
      // constant navigation into literal containers folds to the element
      // (mixed-type members would otherwise force the dynamic encoding,
      // whose tagged struct has no field access — expr.sql:300-360)
      compileExpr(gvalueToAst(constG(e).get._1), ctx)
    case Prop(Var(n), k) if ctx.vars.get(n).exists(_.isEntity) =>
      // a property no row of any matched label carries resolves to NULL
      // (Cypher/reference semantics: absent property ≡ null), not an
      // unresolved-column error — the union view only null-fills props
      // that exist SOMEWHERE; a fully-absent key has no column at all.
      // Reserved names resolve to the ESCAPED property column (n.id is
      // the property, never the graphid — vertex.h accessor split)
      val ek = PropNames.esc(k)
      if (ctx.df != null && !ctx.df.columns.contains(s"${n}__$ek")) lit(null)
      else col(s"${n}__$ek")
    case Prop(base, k) =>
      val b = compileExpr(base, ctx)
      // property access on an entity VALUE (path element, collected
      // vertex/edge): fields that aren't part of the struct shell read
      // from its properties map — reference semantics, where `.name` on a
      // vertex gtype is a property lookup (vertex.h accessors)
      dataTypeOpt(b, ctx) match {
        case Some(st: StructType) if st.fieldNames.contains("properties") &&
            !st.fieldNames.contains(k) =>
          b.getField("properties").getItem(k)
        case Some(st: StructType) if st.fieldNames.contains("properties") &&
            st.fieldNames.contains(k) && hasEscapedProp(k) =>
          // some label stores a user property literally named like this
          // shell field (`id`, `label`): resolve to the PROPERTY (null
          // when absent) so `nodes(p)[0].id` matches `n.id` on the bound
          // variable; graphs without such a property keep the shell field
          b.getField("properties").getItem(k)
        case _ => b.getField(k)
      }
    case ListLit(items) if heteroLitList(items).isDefined =>
      // heterogeneous literal list → array of tagged dynamic values
      // (the reference's gtype list holds mixed scalars natively; one
      // level of nested list/object literals rides the `a`/canonical
      // payloads — lists.sql's [1, 3, 5, [2, 4, 6]] shape)
      array(heteroLitList(items).get.map(graft.gvalue.GValueCol.gLit): _*)
    case ListLit(items)  => array(items.map(x => compileExpr(x, ctx)): _*)
    case e @ MapLit(entries) =>
      // mixed-VALUE-type literal objects ride the dynamic encoding (a
      // plain map() cannot hold them); homogeneous maps stay native
      val mixed = litGValue(e).isDefined && {
        val classes = entries.flatMap(kv => litGValue(kv._2))
          .filter(_ != GNull).map(_.getClass).distinct
        // same GValue class can still compile to different Spark types
        // (nested maps of unlike shapes — expr.sql's {s:{s:'s'}, t:{...}})
        classes.size > 1 || {
          val ts = entries.flatMap(kv => dataTypeOpt(compileExpr(kv._2, ctx), ctx))
            .filterNot(_ == NullType).distinct
          ts.size > 1
        }
      }
      if (mixed) graft.gvalue.GValueCol.gLit(litGValue(e).get)
      else map(entries.flatMap { case (k, v) => Seq(lit(k), compileExpr(v, ctx)) }: _*)
    // variable_edge operator family (sql/postgraph-variable_edge.sql.in:
    // 21-242): set/sequence ops over VLE edge sequences — all computed on
    // the bare 8-byte edge-id arrays, no value materialization needed
    case Bin(op @ ("&&" | "=" | "<>"), Var(a), Var(b))
        if isVleVar(a, ctx) && isVleVar(b, ctx) =>
      op match {
        case "&&" => arrays_overlap(col(s"${a}__ids"), col(s"${b}__ids"))
        case "="  => col(s"${a}__ids") === col(s"${b}__ids")
        case "<>" => col(s"${a}__ids") =!= col(s"${b}__ids")
      }
    // edge-in-VariableEdge containment NEVER sees the VE's LAST edge: the
    // reference's component walk stops at children[0]-1
    // (edge_contained_in_variable_edge / variable_edge_contains_edge,
    // variable_edge.c:227-265; old variable_edge_functions.out prints `f`
    // for the path's own final edge), all four operator spellings
    case Bin("@>" | "<@", Var(x), Var(y))
        if (isVleVar(x, ctx) && ctx.vars.get(y).exists(_.kind == VarKind.Edge)) ||
          (isVleVar(y, ctx) && ctx.vars.get(x).exists(_.kind == VarKind.Edge)) =>
      val (a, e) = if (isVleVar(x, ctx)) (x, y) else (y, x)
      val ids = col(s"${a}__ids")
      array_contains(slice(ids, lit(1), size(ids) - 1), col(s"${e}__id"))
    // distance operators (postgraph-gtype.sql.in:140-167): arrays are
    // vectors (l2 / negative inner product / cosine distance); `<->` on
    // geometric values is point distance
    case e @ Bin("<->", l, r) if litTsqueryStr(e).isDefined =>
      // tsquery phrase combine (tsquery `<->`, tsearch.out:529-533)
      lit(litTsqueryStr(e).get)
    case Bin(op @ ("<->" | "<#>" | "<=>"), l, r) =>
      val lc = compileExpr(l, ctx); val rc = compileExpr(r, ctx)
      (dataTypeOpt(lc, ctx), dataTypeOpt(rc, ctx)) match {
        case (Some(_: ArrayType), Some(_: ArrayType)) => op match {
          case "<->" => graft.functions.VectorFns.l2Distance(lc, rc)
          case "<#>" => graft.functions.VectorFns.negativeInnerProduct(lc, rc)
          case "<=>" => graft.functions.VectorFns.cosineDistance(lc, rc)
        }
        case _ if op == "<->" => graft.functions.RangeGeoFns.pointDistance(lc, rc)
        case other => throw new UnsupportedOperationException(s"$op over $other")
      }
    // key-exists family (postgraph-vertex.sql.in:243-276 / gtype GIN ops):
    // `m ? 'k'` key present, `m ?| keys` any present, `m ?& keys` all
    case Bin(op @ ("?" | "?|" | "?&"), l, r)
        if constG(l).isDefined && constG(r).isDefined &&
          (constG(l).exists(_._2) || constG(r).exists(_._2)) =>
      // explicit-gtype constants fold (SQL-surface GIN operator forms)
      binOp(op, compileExpr(l, ctx), compileExpr(r, ctx), ctx,
        rRaw = Some(r), lRaw = Some(l))
    case Bin(op @ ("?|" | "?-"), l, r)
        if { val lc = compileExpr(l, ctx)
             dataTypeOpt(lc, ctx).map(graft.functions.PgGeoFns.kindOf).contains("point") &&
               dataTypeOpt(compileExpr(r, ctx), ctx)
                 .map(graft.functions.PgGeoFns.kindOf).contains("point") } =>
      // point alignment (PG point_vert/point_horiz): `?|` same x, `?-`
      // same y — geometric.sql:441-447
      val lc = compileExpr(l, ctx); val rc = compileExpr(r, ctx)
      if (op == "?|") lc.getField("x") === rc.getField("x")
      else lc.getField("y") === rc.getField("y")
    case Bin(op @ ("?" | "?|" | "?&"), l, r) =>
      val m = l match {
        case Var(v) if ctx.vars.get(v).exists(_.isEntity) => propertiesMap(v, ctx)
        case other => compileExpr(other, ctx)
      }
      val rc = compileExpr(r, ctx)
      op match {
        case "?"  => map_contains_key(m, rc)
        case "?|" => exists(rc, k => map_contains_key(m, k))
        case "?&" => forall(rc, k => map_contains_key(m, k))
      }
    // constant arithmetic with a NUMERIC operand folds through the GValue
    // ops so the numeric tag and PG result scale survive (gtype_ops.c
    // numeric branches; gtype.out renders `0.0::numeric` for
    // gtype_add('1','-1.0::numeric') — plain Spark decimal math loses
    // the operand scales). The result re-enters as a TAGGED literal.
    case Bin(op @ ("+" | "-" | "*" | "/" | "%" | "^"), l, r)
        if {
          val lv = constG(l).map(_._1); val rv = constG(r).map(_._1)
          lv.isDefined && rv.isDefined &&
            (lv.exists(_.isInstanceOf[GNumeric]) || rv.exists(_.isInstanceOf[GNumeric]))
        } =>
      val lv = constG(l).get._1; val rv = constG(r).get._1
      val res = op match {
        case "+" => GValue.add(lv, rv)
        case "-" => GValue.sub(lv, rv)
        case "*" => GValue.mul(lv, rv)
        case "/" => GValue.div(lv, rv)
        case "%" => GValue.mod(lv, rv)
        case "^" => GValue.pow(lv, rv)
      }
      // GNumeric folds land as a DECIMAL literal carrying the PG result
      // scale (litColumn keeps the BigDecimal's own precision/scale), so
      // downstream numeric fns (ceil/round/casts) still see a plain
      // decimal while the render keeps `0.0::numeric` exact
      compileExpr(gvalueToAst(res), ctx)
    // `!!=` consumes only the __edges arrays — compiling the bare VLE Vars
    // would demand the full (nodes+edges) materialization; hand binOp
    // placeholder columns and let the raw-expr dispatch do the work
    case Bin("!!=", l @ Var(a), r @ Var(b))
        if isVleVar(a, ctx) && isVleVar(b, ctx) =>
      binOp("!!=", col(s"${a}__ids"), col(s"${b}__ids"), ctx,
        rRaw = Some(r), lRaw = Some(l))
    case Bin(op, l, r) => binOp(op, compileExpr(l, ctx), compileExpr(r, ctx), ctx,
      rRaw = Some(r), lRaw = Some(l))
    case Un("NOT", x) => !compileExpr(x, ctx)
    case Un("NEG", x) if constG(x).map(_._1).exists(_.isInstanceOf[GNumeric]) =>
      // numeric negation keeps the tag and scale (gtype_neg('0::numeric')
      // → `0::numeric`, not a plain double 0)
      constG(x).get._1 match {
        case GNumeric(n) => compileExpr(gvalueToAst(GNumeric(-n)), ctx)
        case other => -compileExpr(gvalueToAst(other), ctx)
      }
    case Un("NEG", x) =>
      val c = compileExpr(x, ctx)
      dataTypeOpt(c, ctx) match {
        case Some(t) if isIntervalStruct(t) => // gtype interval negation
          graft.functions.TemporalFns.scaleInterval(c, lit(-1.0))
        case _ => -c
      }
    case IsNull(x, not) =>
      val c = compileExpr(x, ctx)
      if (not) c.isNotNull else c.isNull
    case StringOp(op, l, r) =>
      // PG resolves `~~` by operand type: over geometry it is the n-D
      // CONTAINS operator (PostGIS GIDX family), not LIKE — probe the
      // constant-geometry domain first (postgis.out:1810-1860)
      if (op == "LIKE") {
        def asG(e: Expr): Option[GeomWkt.G] = geomConst(e).flatMap {
          case gg: GeomWkt.G => Some(gg)
          case _ => None
        }
        (asG(l), asG(r)) match {
          case (Some(a), Some(b)) => return lit(GeomWkt.ndOp("~~", a, b))
          case _ => ()
        }
      }
      val lc = compileExpr(l, ctx)
      lazy val rc = compileExpr(r, ctx)
      op match {
        case "STARTS"   => lc.startsWith(rc)
        case "ENDS"     => lc.endsWith(rc)
        case "CONTAINS" => lc.contains(rc)
        // regex family (=~ / ~ / ~* / !~ / !~*): unanchored search, pattern
        // may itself be a column (reference gtype_eq_tilde & friends,
        // gtype_string.c:163-227). call_function keeps the codegen'd RLike
        // even for non-literal patterns.
        case "REGEX"        => call_function("rlike", lc, rc)
        case "REGEX_CI"     => call_function("rlike", lc, concat(lit("(?i)"), rc))
        case "NOT_REGEX"    => !call_function("rlike", lc, rc)
        case "NOT_REGEX_CI" => !call_function("rlike", lc, concat(lit("(?i)"), rc))
        // LIKE family (~~ / ~~* / !~~ / !~~*): %/_ wildcards, full-string
        // anchor, backslash escape — PG textlike semantics
        case "LIKE"      => call_function("like", lc, rc)
        case "NOT_LIKE"  => !call_function("like", lc, rc)
        case "ILIKE"     => call_function("ilike", lc, rc)
        case "NOT_ILIKE" => !call_function("ilike", lc, rc)
      }
    case CaseExpr(operand, whens, otherwise) =>
      // a NULL-literal condition needs the boolean type Spark's CASE
      // demands; operand comparisons go through the dynamic-aware equality
      // so CASE over heterogeneous property columns works (expr.sql CASE
      // over n.j)
      def asCond(c: Column, raw: Expr): Column = raw match {
        case Lit(GNull) => c.cast("boolean")
        case _ => c
      }
      val branches0 = operand match {
        case Some(op) =>
          whens.map { case (c, v) =>
            (asCond(compileExpr(Bin("=", op, c), ctx), Lit(GBool(true))),
              compileExpr(v, ctx), v) }
        case None =>
          whens.map { case (c, v) =>
            (asCond(compileExpr(c, ctx), c), compileExpr(v, ctx), v) }
      }
      val otherC = otherwise.map(o => (compileExpr(o, ctx), o))
      // mixed-type result branches ride the dynamic encoding (the
      // reference's CASE yields gtype, so 'b'/1/[0,1,2]/{i:1} coexist)
      val valTypes = (branches0.map(_._2) ++ otherC.map(_._1).toSeq)
        .flatMap(dataTypeOpt(_, ctx)).filterNot(_ == NullType).distinct
      def enc(c: Column, raw: Expr): Column = dataTypeOpt(c, ctx) match {
        case Some(dt) if valTypes.size > 1 =>
          graft.gvalue.GValueCol.dynCoerce(c, dt)
            .orElse(litGValue(raw).map(graft.gvalue.GValueCol.gLit))
            .getOrElse(c)
        case _ => c
      }
      val branches = branches0.map { case (c, v, raw) => (c, enc(v, raw)) }
      val start = when(branches.head._1, branches.head._2)
      val chained = branches.tail.foldLeft(start)((acc, b) => acc.when(b._1, b._2))
      otherC.map { case (o, raw) => chained.otherwise(enc(o, raw)) }.getOrElse(chained)
    // indexed path access pre-bound as a single-entity column (see
    // materializeVleElem) — matches before the generic Index compile
    case Index(FnCall("nodes", List(Var(p)), _), LitInt(i))
        if singleVleOf(p, ctx).exists(v =>
          ctx.df.columns.contains(vleElemName(v, edges = false, i))) =>
      col(vleElemName(singleVleOf(p, ctx).get, edges = false, i))
    case Index(FnCall("relationships" | "edges", List(Var(p)), _),
        LitInt(i))
        if singleVleOf(p, ctx).exists(v =>
          ctx.df.columns.contains(vleElemName(v, edges = true, i))) =>
      col(vleElemName(singleVleOf(p, ctx).get, edges = true, i))
    case Index(base, idx) =>
      val b = compileExpr(base, ctx)
      val i = compileExpr(idx, ctx)
      import graft.gvalue.GValueCol
      dataTypeOpt(b, ctx) match {
        case Some(t) if GValueCol.isGValue(t) =>
          // index into a dynamic ARRAY value (tag TArray): the one-level
          // `a` payload; out-of-bounds or non-array → null
          val el = when(i >= 0, try_element_at(b.getField("a"), (i + 1).cast("int")))
            .otherwise(try_element_at(b.getField("a"), i.cast("int")))
          when(el.isNull, lit(null).cast(GValueCol.structType))
            .otherwise(GValueCol.promoteScalar(el))
        case _ =>
          // Cypher list index is 0-based, negatives count from the end;
          // element_at is 1-based with negative-from-end support.
          // try_: out-of-bounds access is null (lists.sql "should return
          // null" rows), not an ANSI error.
          when(i >= 0, try_element_at(b, (i + 1).cast("int")))
            .otherwise(try_element_at(b, i.cast("int")))
      }
    case Slice(base, lo, hi) =>
      // negative bounds count from the end (reference lists.sql:55-75);
      // bounds clamp to [0, size] like the reference's slice semantics
      val b0 = compileExpr(base, ctx)
      import graft.gvalue.GValueCol
      // slicing a dynamic ARRAY value slices its payload and stays dynamic
      val dynArr = dataTypeOpt(b0, ctx).exists(GValueCol.isGValue)
      val b = if (dynArr) b0.getField("a") else b0
      val n = size(b)
      def norm(c: Column) = {
        val fromEnd = when(c < 0, greatest(n + c, lit(0))).otherwise(least(c, n))
        fromEnd.cast("int")
      }
      val loC = norm(lo.map(x => compileExpr(x, ctx)).getOrElse(lit(0)))
      val hiC = norm(hi.map(x => compileExpr(x, ctx)).getOrElse(size(b)))
      val sliced = slice(b, loC + 1, greatest(hiC - loC, lit(0)))
      if (dynArr) GValueCol.arrayValue(sliced) else sliced
    case ListComp(v, src, whereOpt, projOpt) =>
      val srcC = compileExpr(src, ctx)
      val filtered = whereOpt match {
        case Some(p) => filter(srcC, x => compileLambda(p, v, x, ctx))
        case None    => srcC
      }
      projOpt match {
        case Some(p) => transform(filtered, x => compileLambda(p, v, x, ctx))
        case None    => filtered
      }
    case CountStar() => throw new IllegalStateException("count(*) outside aggregation")
    case FnCall(name, args, _) => compileFn(name, args, ctx)
    case BoolCol(n) => col(n) // sublink pre-bound by bindSublinks
    // raw sublinks only survive to here from positions bindSublinks doesn't
    // cover (lambda bodies of list comprehensions)
    case ExistsPattern(_) | ExistsSubquery(_) => throw new UnsupportedOperationException(
      "EXISTS(...) is not supported inside list-comprehension lambdas")
    case _: SubLink => throw new UnsupportedOperationException(
      "ANY/ALL subqueries are not supported inside list-comprehension lambdas")
  }

  /** Compile expression with one lambda variable bound to a Column. */
  private def compileLambda(e: Expr, v: String, x: Column, ctx: Ctx): Column = e match {
    case Var(`v`)          => x
    case Prop(Var(`v`), k) => x.getField(k)
    case Lit(g)            => litColumn(g)
    case Bin(op, l, r)     => binOp(op, compileLambda(l, v, x, ctx), compileLambda(r, v, x, ctx), ctx)
    case Un("NOT", b)      => !compileLambda(b, v, x, ctx)
    case Un("NEG", b)      => -compileLambda(b, v, x, ctx)
    case IsNull(b, not)    =>
      val c = compileLambda(b, v, x, ctx); if (not) c.isNotNull else c.isNull
    case other             => compileExpr(other, ctx)
  }

  private def isNumericLike(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case _: org.apache.spark.sql.types.NumericType => true
    // dynamic gtype values resolve numeric-vs-not at runtime, like the
    // reference's runtime dispatch — let them through
    case t if graft.gvalue.GValueCol.isGValue(t) => true
    case _ => false
  }

  /** True when the column's schema already IS the given geometric kind —
    * makes `to<kind>(x)::<kind>` re-casts identity (same rule as toinet).
    */
  private def geoKindIs(c: Column, kind: String, ctx: Ctx): Boolean =
    dataTypeOpt(c, ctx).map(graft.functions.PgGeoFns.kindOf).contains(kind)

  private def geoKindOf(c: Column, ctx: Ctx): String = {
    val k = dataTypeOpt(c, ctx).map(graft.functions.PgGeoFns.kindOf).getOrElse("")
    require(k.nonEmpty, "geometric function requires a geometric operand")
    k
  }

  /** Geometric infix operators — plan-time dispatch on the struct-schema
    * type tags (the reference's GT_IS_* runtime dispatch, resolved
    * statically; gtype_geometric.c / postgraph-geometric.sql.in).
    */
  private def geoOp(op: String, l: Column, r: Column, ctx: Ctx): Column = {
    import graft.functions.PgGeoFns._
    val lk = dataTypeOpt(l, ctx).map(kindOf).getOrElse("")
    val rk = dataTypeOpt(r, ctx).map(kindOf).getOrElse("")
    require(lk.nonEmpty && rk.nonEmpty,
      s"$op requires geometric operands (got ${lk.isEmpty}/${rk.isEmpty})")
    op match {
      case "#"   => intersectionPoint(l, lk, r, rk)
      case "##"  => closest(l, lk, r, rk)
      case "~="  => sameAs(l, lk, r, rk)
      case "&<|" => noExtendAbove(l, lk, r, rk)
      case "|&>" => noExtendBelow(l, lk, r, rk)
      case "+" | "-" | "*" | "/" => geoArith(op, l, lk, r, rk)
      case "?#"  => intersects(l, lk, r, rk)
      case "?-|" => perp(l, lk, r, rk)
      case "?||" => parallel(l, lk, r, rk)
      case "@>"  => contains(l, lk, r, rk)
      case "<@"  => contains(r, rk, l, lk)
      case "<<"  => leftOf(l, lk, r, rk)
      case ">>"  => rightOf(l, lk, r, rk)
      case "<<|" => below(l, lk, r, rk)
      case "|>>" => above(l, lk, r, rk)
      case "&<"  => noExtendRight(l, lk, r, rk)
      case "&>"  => noExtendLeft(l, lk, r, rk)
    }
  }

  /** Range/multirange type tag from schema ("" when neither). */
  private def rangeKindOf(t: org.apache.spark.sql.types.DataType): String = t match {
    case s: StructType if s.fieldNames.sameElements(Array("lo", "hi", "lo_inc", "hi_inc")) =>
      "range"
    case ArrayType(s: StructType, _)
        if s.fieldNames.sameElements(Array("lo", "hi", "lo_inc", "hi_inc")) =>
      "multirange"
    case _ => ""
  }

  /** `@>` / `<@` / `&&` — range and multirange semantics (gtype_range.c)
    * when either side is range-typed; geometric containment otherwise.
    */
  private def containOp(op: String, l: Column, r: Column, ctx: Ctx): Column = {
    import graft.functions.{PgGeoFns, RangeGeoFns}
    val lk = dataTypeOpt(l, ctx).map(rangeKindOf).getOrElse("")
    val rk = dataTypeOpt(r, ctx).map(rangeKindOf).getOrElse("")
    // tsquery containment (tsquery_ops `@>`/`<@`, tsearch.sql:149-154):
    // tsquery values are canonical strings, so string×string containment
    // resolves here before the geometric dispatch
    if (lk.isEmpty && rk.isEmpty && (op == "@>" || op == "<@") &&
        dataTypeOpt(l, ctx).contains(StringType) &&
        dataTypeOpt(r, ctx).contains(StringType)) {
      return if (op == "@>") graft.functions.TsearchFns.tsqueryContains(l, r)
      else graft.functions.TsearchFns.tsqueryContains(r, l)
    }
    if (lk.isEmpty && rk.isEmpty) op match {
      case "&&" => // geometric overlap via bounding boxes
        val glk = geoKindOf(l, ctx); val grk = geoKindOf(r, ctx)
        PgGeoFns.intersects(PgGeoFns.boundBox(l, glk), "box",
          PgGeoFns.boundBox(r, grk), "box")
      case _ => geoOp(op, l, r, ctx)
    } else if (op == "<@") containOp("@>", r, l, ctx)
    else op match {
      case "@>" => (lk, rk) match {
        case ("range", "range")           => RangeGeoFns.rangeContainsRange(l, r)
        case ("range", "")                => RangeGeoFns.rangeContains(l, r)
        case ("multirange", "range")      => RangeGeoFns.multiContainsRange(l, r)
        case ("multirange", "multirange") => forall(r, q => RangeGeoFns.multiContainsRange(l, q))
        case ("multirange", "")           => RangeGeoFns.multiContainsElem(l, r)
        case other => throw new UnsupportedOperationException(s"@> over $other")
      }
      case "&&" => (lk, rk) match {
        case ("range", "range")           => RangeGeoFns.rangeOverlaps(l, r)
        case ("multirange", "multirange") => RangeGeoFns.multiOverlaps(l, r)
        case ("multirange", "range")      => RangeGeoFns.multiOverlaps(l, array(r))
        case ("range", "multirange")      => RangeGeoFns.multiOverlaps(array(l), r)
        case other => throw new UnsupportedOperationException(s"&& over $other")
      }
    }
  }

  /** Catalog label name for a packed entity id: the high 16 bits are the
    * label id (graphid.h); ids 1/2 are the unlabeled vertex/edge catalog
    * labels, rendered "" (vertex.out:48-56).
    */
  private def labelNameOf(id: Long): String = {
    val lid = (id >> 48).toInt
    if (lid <= 2) ""
    else graph.labelIds.collectFirst {
      case (name, i) if i == lid && name != "_default" => name
    }.getOrElse("")
  }

  /** Constant gtype value of an expression subtree. The Boolean marks an
    * EXPLICIT gtype provenance (`::gtype` / gtype_in / container literal) —
    * PG's unknown-literal coercion only fires against an explicitly typed
    * operand, and pure-Cypher literal comparisons must keep their column
    * path untouched.
    */
  private def constG(e: Expr): Option[(GValue, Boolean)] = e match {
    case Lit(v) => Some((v, false))
    case FnCall("togtype" | "gtype_in", List(x), _) => x match {
      case Lit(GString(s)) =>
        scala.util.Try(GValue.parseRender(s)).toOption.map((_, true))
      case other => constG(other).map { case (v, _) => (v, true) }
    }
    case ListLit(items) =>
      val vs = items.map(constG)
      if (vs.nonEmpty && vs.forall(_.isDefined))
        Some((GArray(vs.map(_.get._1).toVector), true))
      else None
    case MapLit(entries) =>
      val vs = entries.map { case (k, x) => constG(x).map(p => k -> p._1) }
      if (vs.forall(_.isDefined))
        Some((GMap(scala.collection.immutable.TreeMap(vs.flatten: _*)), true))
      else None
    case Un("NEG", x) => constG(x).map { case (v, ex) => (GValue.neg(v), ex) }
    // internal entity constructors (vertex.sql/edge.sql value surface:
    // build_vertex/build_edge over _graphid + gtype_build_* literals) —
    // constant gtype maps rendering in the reference's `{"id": …,
    // "label": …, "properties": {…}}` form
    case FnCall("gtype_build_map", args, _) =>
      val pairs = args.grouped(2).toList
      if (pairs.exists(_.length != 2)) None
      else {
        val kvs = pairs.map {
          case List(k, v) => for { kp <- constG(k); vp <- constG(v) } yield {
            val key = kp._1 match {
              case GString(s) => s
              case GInt(i) => i.toString
              case other => other.render
            }
            key -> vp._1
          }
          case _ => None
        }
        if (kvs.forall(_.isDefined)) Some((GMap.of(kvs.flatten: _*), true)) else None
      }
    case FnCall("gtype_build_list", args, _) =>
      val vs = args.map(constG)
      if (vs.forall(_.isDefined)) Some((GArray(vs.map(_.get._1).toVector), true))
      else None
    case FnCall("_graphid", List(l, e), _) =>
      (constG(l), constG(e)) match {
        case (Some((GInt(li), _)), Some((GInt(ei), _))) =>
          Some((GInt((li << 48) | ei), true))
        case _ => None
      }
    case FnCall("tographid", List(x), _) => constG(x).flatMap {
      case (GString(s), _) => scala.util.Try(GInt(s.toLong)).toOption.map((_, true))
      case (g: GInt, _) => Some((g, true))
      case _ => None
    }
    case FnCall("build_vertex", List(idE, _, propsE), _) =>
      (constG(idE), constG(propsE)) match {
        case (Some((GInt(id), _)), Some((props, _))) => props match {
          case m: GMap => Some((GMap.of("id" -> GInt(id),
            "label" -> GString(labelNameOf(id)), "properties" -> m), true))
          case _ => Some((GNull, true)) // NULL / non-map properties → NULL
        }
        case _ => None
      }
    case FnCall("build_traversal", args, _) =>
      val vs = args.map(constG)
      if (!vs.forall(_.isDefined)) None
      else {
        val items = vs.map(_.get._1).flatMap {
          case GArray(xs) => xs // nested traversal splices in
          case v => Vector(v)
        }
        if (items.contains(GNull)) Some((GNull, true))
        else {
          items.zipWithIndex.foreach { case (v, i) =>
            val kind = v match {
              case m: GMap if m.entries.contains("start_id") => "edge"
              case m: GMap if m.entries.contains("id") => "vertex"
              case _ => "other"
            }
            if (i % 2 == 0) require(kind == "vertex",
              s"arguement $i build_traversal() must be a vertex")
            else require(kind == "edge",
              s"arguement $i build_traversal() must be an edge")
          }
          Some((GArray(items.toVector), true))
        }
      }
    case FnCall("build_variable_edge", args, _) =>
      val vs = args.map(constG)
      if (!vs.forall(_.isDefined)) None
      else {
        val items = vs.map(_.get._1).toVector
        if (items.contains(GNull)) Some((GNull, true))
        else {
          def isEdge(v: GValue) = v match {
            case m: GMap => m.entries.contains("start_id"); case _ => false
          }
          def isVertex(v: GValue) = v match {
            case m: GMap => m.entries.contains("id") && !m.entries.contains("start_id")
            case _ => false
          }
          require(items.nonEmpty && isEdge(items.last),
            "VariableEdges must end with an edge")
          items.zipWithIndex.foreach { case (v, i) =>
            if (i % 2 == 0) require(isEdge(v),
              s"arguement $i build_variable_edge() must be an edge")
            else require(isVertex(v),
              s"arguement $i build_traversal() must be a vertex")
          }
          Some((GArray(items), true))
        }
      }
    case FnCall("build_edge", List(idE, sE, eE, _, propsE), _) =>
      (constG(idE), constG(sE), constG(eE), constG(propsE)) match {
        case (Some((GInt(id), _)), Some((GInt(s), _)), Some((GInt(en), _)),
            Some((props, _))) => props match {
          case m: GMap => Some((GMap.of("id" -> GInt(id),
            "start_id" -> GInt(s), "end_id" -> GInt(en),
            "label" -> GString(labelNameOf(id)), "properties" -> m), true))
          case _ => Some((GNull, true))
        }
        case _ => None
      }
    // scalar cast annotations inside literal containers ({e: 2::numeric})
    case FnCall("tonumeric" | "tointeger" | "toint" | "tofloat", List(x), _) =>
      constG(x).flatMap { case (v, ex) =>
        val num: Option[BigDecimal] = v match {
          case GInt(i)     => Some(BigDecimal(i))
          // float→numeric goes through float8out's SHORTEST text (PG
          // float8_numeric): ((1+2.71)*3)::numeric is 11.13, not the
          // binary expansion 11.129999999999999
          case GFloat(f)   =>
            if (f.isNaN || f.isInfinite) None
            else Some(BigDecimal(graft.gvalue.PgOut.pgFloat(f)))
          case GNumeric(n) => Some(n)
          case GString(s)  => scala.util.Try(BigDecimal(s)).toOption
          case GNull       => None
          case _           => None
        }
        (v, num) match {
          case (GNull, _) => Some((GNull, ex))
          case (_, Some(n)) => e match {
            case FnCall("tonumeric", _, _) => Some((GNumeric(n), ex))
            case FnCall("tofloat", _, _)   => Some((GFloat(n.toDouble), ex))
            case _ =>
              // int casts ROUND (expr.out `2.71::int` → 3): float input
              // rounds half-even (PG dtoi8/rint), numeric/text half-up
              val mode = v match {
                case _: GFloat => java.math.RoundingMode.HALF_EVEN
                case _ => java.math.RoundingMode.HALF_UP
              }
              Some((GInt(n.bigDecimal.setScale(0, mode).longValueExact()), ex))
          }
          case _ => None
        }
      }
    // constant NUMERIC arithmetic folds value-side so a downstream cast
    // sees the float8out-shortest result (((1+2.71)*3)::numeric → 11.13,
    // not the binary expansion — expr.sql). Numbers only; ex flags OR.
    case Bin(op @ ("+" | "-" | "*" | "/" | "%" | "^"), l, r) =>
      (constG(l), constG(r)) match {
        case (Some((a, ex1)), Some((b, ex2)))
            if GValue.sortPriority(a) == 4 && GValue.sortPriority(b) == 4 =>
          scala.util.Try(op match {
            case "+" => GValue.add(a, b); case "-" => GValue.sub(a, b)
            case "*" => GValue.mul(a, b); case "/" => GValue.div(a, b)
            case "%" => GValue.mod(a, b); case "^" => GValue.pow(a, b)
          }).toOption.map(v => (v, ex1 || ex2))
        case _ => None
      }
    // constant container navigation ([..][1].key chains — expr.sql:300-360)
    case Index(inner, idx) =>
      (constG(inner), constG(idx)) match {
        case (Some((GArray(items), ex)), Some((GInt(i), _))) =>
          val n = if (i < 0) items.length + i else i
          Some((if (n >= 0 && n < items.length) items(n.toInt) else GNull, ex))
        case (Some((GMap(entries), ex)), Some((GString(k), _))) =>
          Some((constMapLookup(entries, k), ex))
        case _ => None
      }
    case Prop(inner, k) => constG(inner) match {
      case Some((GMap(entries), ex)) => Some((constMapLookup(entries, k), ex))
      case _ => None
    }
    case _ => None
  }

  /** `->`/`.key` navigation into a constant map: an ENTITY value
    * (build_vertex/build_edge — id+label+properties shape) resolves
    * through its PROPERTIES object, never the shell fields (vertex.out:
    * `build_vertex(…, gtype_build_map())->'id'` is NULL, not the graphid;
    * the shell reads are the id()/label()/… accessors instead).
    */
  private def constMapLookup(entries: Map[String, GValue], k: String): GValue =
    if (entries.contains("id") && entries.contains("label") &&
        entries.contains("properties"))
      entries("properties") match {
        case GMap(props) => props.getOrElse(k, GNull)
        case _ => GNull
      }
    else entries.getOrElse(k, GNull)

  private def binOp(op: String, l: Column, r: Column, ctx: Ctx,
      rRaw: Option[Expr] = None, lRaw: Option[Expr] = None): Column = {
    // SQL-surface gtype comparisons fold at compile time (the reference's
    // gtype btree operators are a total cross-type order, unlike Cypher's
    // 3VL column comparisons): fires only when a side is EXPLICITLY gtype,
    // with PG's unknown-string-literal coercion toward the typed side
    if (Set("=", "<>", "<", "<=", ">", ">=", "@>", "<@", "?", "?|", "?&")
        .contains(op)) {
      (lRaw.flatMap(constG), rRaw.flatMap(constG)) match {
        case (Some((lv0, lEx)), Some((rv0, rEx))) if lEx || rEx =>
          def coerce(v: GValue, otherExplicit: Boolean): GValue = v match {
            case GString(s) if otherExplicit =>
              scala.util.Try(GValue.parseRender(s)).getOrElse(v)
            case _ => v
          }
          val lv = coerce(lv0, rEx && !lEx)
          val rv = coerce(rv0, lEx && !rEx)
          // the SQL btree operator surface is a TOTAL order — gtype null
          // sorts largest (sortPriority 11), so `'1' < 'null'` is t, not
          // SQL-null (gtype.out). Containment/key-exists keep null-in →
          // null-out.
          if ((lv == GNull || rv == GNull) &&
            !Set("=", "<>", "<", "<=", ">", ">=").contains(op))
            return lit(null).cast("boolean")
          def keys(v: GValue): Seq[String] = v match {
            case GArray(items) => items.collect { case GString(s) => s }
            case GString(s)    => Seq(s)
            case _             => Seq.empty
          }
          def isEntity(v: GValue): Boolean = v match {
            case GMap(es) => es.contains("id") && es.contains("label") &&
              es.contains("properties")
            case _ => false
          }
          // entity operands: `@>`/`?` read the PROPERTIES object, not the
          // shell, with jsonb's vacuous truth — {} ⊆ anything (vertex.out
          // `build_vertex(…, map()) @> gtype_build_map()` is t;
          // vertex_contains → gtype_deep_contains over the props iterator,
          // vertex.c:264-290)
          def props(v: GValue): GValue = v match {
            case GMap(es) if isEntity(v) => es("properties")
            case other => other
          }
          def entContains(container: GValue, contained: GValue): Boolean =
            GValue.contains(props(container), props(contained))
          // `x <@ vertex` binds vertex_contained_by(gtype, vertex), which
          // tests CONSTRAINT-CONTAINS-PROPERTIES — i.e. contains(lhs,
          // props(rhs)), the reverse of jsonb <@ (vertex.c:279-290:
          // gtype_deep_contains(&constraint_it, &property_it); vertex.out
          // `map() <@ build_vertex(…, map('id',2))` → f)
          def entContainedBy(l: GValue, r: GValue): Boolean =
            if (isEntity(r)) GValue.contains(l, props(r))
            else GValue.contains(props(r), props(l))
          // entity-sequence compares (traversal.c / variable_edge.c):
          // - a TRAVERSAL (vertex-headed child array) compares by CHILD
          //   COUNT ONLY: the reference's TRAVERSAL_GET_FIRST_ENTITY macro
          //   hardcodes `lhs` (traversal.h:44-45), so its per-id loop
          //   compares lhs with itself and only the trailing length check
          //   decides — traversal.out records exactly that (differing ids,
          //   equal length → t)
          // - a VARIABLE EDGE (edge-headed child array) compares
          //   element-wise by entity ID, then by count
          //   (compare_variable_edge_orderability, variable_edge.c:109-143)
          def entityId(v: GValue): Long = v match {
            case GMap(es) => es.get("id") match {
              case Some(GInt(i)) => i; case _ => 0L
            }
            case _ => 0L
          }
          def isEdge(v: GValue): Boolean = v match {
            case GMap(es) => isEntity(v) && es.contains("start_id")
            case _ => false
          }
          lazy val c = (lv, rv) match {
            case (GArray(xs), GArray(ys))
                if xs.headOption.exists(isEntity) && ys.headOption.exists(isEntity) =>
              if (xs.headOption.exists(isEdge) || ys.headOption.exists(isEdge)) {
                xs.zip(ys).iterator
                  .map { case (x, y) => entityId(x).compare(entityId(y)) }
                  .find(_ != 0).getOrElse(xs.length.compare(ys.length))
              } else xs.length.compare(ys.length)
            case _ => GValue.cmp(lv, rv)
          }
          return lit(op match {
            case "="  => c == 0; case "<>" => c != 0
            case "<"  => c < 0;  case "<=" => c <= 0
            case ">"  => c > 0;  case ">=" => c >= 0
            case "@>" => entContains(lv, rv)
            case "<@" => entContainedBy(lv, rv)
            case "?"  => keys(rv).headOption.exists(GValue.existsKey(props(lv), _))
            case "?|" => keys(rv).exists(GValue.existsKey(props(lv), _))
            case "?&" => keys(rv).forall(GValue.existsKey(props(lv), _))
          })
        case _ => ()
      }
    }
    // inet operator family first (inet.c / gtype_network.c): subnet
    // containment, overlap, bitwise ops, address arithmetic — these reuse
    // symbols the geometric/tsearch families also claim, so type-dispatch
    // on the inet struct before the shared tables below
    val lInetT = dataTypeOpt(l, ctx).exists(isInetStruct)
    val rInetT = dataTypeOpt(r, ctx).exists(isInetStruct)
    if (lInetT || rInetT) {
      val N = graft.functions.NetworkFns
      (op match {
        case "<<" if lInetT && rInetT  => Some(N.containedIn(l, r))
        case "<<=" if lInetT && rInetT => Some(N.containedInOrEq(l, r))
        case ">>" if lInetT && rInetT  => Some(N.containedIn(r, l))
        case ">>=" if lInetT && rInetT => Some(N.containedInOrEq(r, l))
        case "&&" if lInetT && rInetT =>
          Some(N.containedInOrEq(l, r) || N.containedInOrEq(r, l))
        case "&" | "|" if lInetT && rInetT =>
          def bw(f: (Column, Column) => Column) = struct(
            l.getField("family").as("family"),
            f(l.getField("hi"), r.getField("hi")).as("hi"),
            f(l.getField("lo"), r.getField("lo")).as("lo"),
            greatest(l.getField("masklen"), r.getField("masklen")).as("masklen"))
          Some(if (op == "&") bw(_ bitwiseAND _) else bw(_ bitwiseOR _))
        case "+" if lInetT && !rInetT => Some(struct(
          l.getField("family").as("family"), l.getField("hi").as("hi"),
          (l.getField("lo") + r.cast("long")).as("lo"),
          l.getField("masklen").as("masklen")))
        case "+" if rInetT && !lInetT => Some(struct(
          r.getField("family").as("family"), r.getField("hi").as("hi"),
          (r.getField("lo") + l.cast("long")).as("lo"),
          r.getField("masklen").as("masklen")))
        case "-" if lInetT && !rInetT => Some(struct(
          l.getField("family").as("family"), l.getField("hi").as("hi"),
          (l.getField("lo") - r.cast("long")).as("lo"),
          l.getField("masklen").as("masklen")))
        case "-" if lInetT && rInetT => // address difference → bigint
          Some(l.getField("lo") - r.getField("lo"))
        case _ => None
      }) match {
        case Some(c) => return c
        case None => ()
      }
    }
    binOpRest(op, l, r, ctx, rRaw, lRaw)
  }

  private def binOpRest(op: String, l: Column, r: Column, ctx: Ctx,
      rRaw: Option[Expr] = None, lRaw: Option[Expr] = None): Column = (op match {
    case "=" | "<>" | "<" | "<=" | ">" | ">=" =>
      gAwareCmp(op, l, r, ctx, lRaw, rRaw)
    case "@>" | "<@" if {
        def vle(e: Option[Expr]) = e.exists {
          case Var(v) => isVleVar(v, ctx); case _ => false }
        def edgeVar(e: Option[Expr]) = e.exists {
          case Var(v) => ctx.vars.get(v).exists(_.isEntity); case _ => false }
        (vle(lRaw) && edgeVar(rRaw)) || (vle(rRaw) && edgeVar(lRaw)) } =>
      // edge-membership in a variable edge: BOTH `e @> ve` and `ve <@ e`
      // are "ve's edge list contains e" in the reference
      // (variable_edge_functions.out:106-118 — t exactly on e ∈ ve)
      val (veName, eName) = (lRaw.get, rRaw.get) match {
        case (Var(a), Var(b)) if isVleVar(a, ctx) => (a, b)
        case (Var(a), Var(b)) => (b, a)
        case other => throw new IllegalStateException(s"vle containment: $other")
      }
      Some(exists(col(s"${veName}__edges"),
        ed => ed.getField("id") === col(s"${eName}__id")))
    case "!!=" if {
        def vle(e: Option[Expr]) = e.exists {
          case Var(v) => isVleVar(v, ctx); case _ => false }
        vle(lRaw) && vle(rRaw) } =>
      // match_vles / the `!!=` operator (reference variable_edge.c:269-289,
      // catalog postgraph.sql.in:529-537): NOT disjointness — the C takes
      // the FIRST edge of the lhs and the LAST edge of the rhs and returns
      // true when they share any endpoint vertex id (start/end × start/end),
      // i.e. "could these two VLE paths join end-to-start". Exercised by no
      // reference regress statement; semantics taken from the C source.
      val (aName, bName) = (lRaw.get, rRaw.get) match {
        case (Var(a), Var(b)) => (a, b)
        case other => throw new IllegalStateException(s"!!= operands: $other")
      }
      val fe = element_at(col(s"${aName}__edges"), 1)
      val le = element_at(col(s"${bName}__edges"), -1)
      val (fs, fd) = (fe.getField("start_id"), fe.getField("end_id"))
      val (ls, ld) = (le.getField("start_id"), le.getField("end_id"))
      Some(fs === ls || fd === ls || fs === ld || fd === ld)
    case op if (Compiler.geomBoxOps(op) || Compiler.geomNdOps(op) || op == "|=|") && {
        // a constant side counts as geometry when it folds to a GeomWkt.G,
        // or (r10 regression: togeometry(box3d) folds to the polyhedral-
        // surface EWKT *string*, not a G — g30's `&&` silently fell through
        // to the native-PG geo path and errored) when a geometry-producing
        // FnCall folds to WKT text that parses. Bare string literals stay
        // excluded so tsquery/box-string operands keep their own dispatch.
        def isG(e: Option[Expr]) = e.exists {
          case x: FnCall => geomConst(x).exists {
            case _: GeomWkt.G => true
            case s: String => scala.util.Try(GeomWkt.parse(s)).isSuccess
            case _ => false
          }
          case x => geomConst(x).exists(_.isInstanceOf[GeomWkt.G])
        }
        isG(lRaw) || isG(rRaw) } =>
      // PostGIS geometry operators: both-constant forms evaluate driver-
      // side; a constant against a dynamic column (an EWKT property)
      // compares bounding boxes columnar via the WKT coordinate parse
      def asG(e: Option[Expr]): Option[GeomWkt.G] =
        e.flatMap(x => geomConst(x)).flatMap {
          case gg: GeomWkt.G => Some(gg)
          // a bare WKT string against a ::geometry (postgis.sql |=| forms)
          case s: String => scala.util.Try(GeomWkt.parse(s)).toOption
          case _ => None
        }
      (asG(lRaw), asG(rRaw)) match {
        case (Some(a), Some(b)) if op == "|=|" =>
          // temporally disjoint → SQL NULL (blank), not NaN (postgis.out)
          val d = GeomWkt.cpaOf(GeomWkt.trajectory(a), GeomWkt.trajectory(b))._2
          Some(if (d.isNaN) lit(null).cast("double") else lit(d))
        case (Some(a), Some(b)) if Compiler.geomNdOps(op) =>
          Some(lit(GeomWkt.ndOp(op, a, b)))
        case (Some(a), Some(b)) => Some(lit(GeomWkt.bboxOp(op, a, b)))
        case (Some(a), None) if !Compiler.geomNdOps(op) =>
          Some(bboxColCmp(op, geomBBoxLit(a), geomStrBBox(r, ctx)))
        case (None, Some(b)) if !Compiler.geomNdOps(op) =>
          Some(bboxColCmp(op, geomStrBBox(l, ctx), geomBBoxLit(b)))
        case _ if Compiler.geomNdOps(op) => throw new UnsupportedOperationException(
          s"n-D geometry operator $op requires constant geometry operands")
        case _ => None
      }
    case "@>" | "<@" | "&&" => Some(containOp(op, l, r, ctx))
    case "#" | "##" | "?#" | "?-|" | "?||" |
         "<<" | ">>" | "&<" | "&>" | "<<|" | "|>>" | "~=" | "&<|" | "|&>" =>
      Some(geoOp(op, l, r, ctx))
    case "+" | "-" | "*" | "/"
        if dataTypeOpt(l, ctx).exists(t =>
             graft.functions.PgGeoFns.kindOf(t).nonEmpty) &&
           dataTypeOpt(r, ctx).map(graft.functions.PgGeoFns.kindOf).contains("point") =>
      // point translation / complex-plane product over the geometric kinds
      Some(geoOp(op, l, r, ctx))
    case _ => None
  }).getOrElse(op match {
    case "+"  =>
      // gtype `+` is also string/list concatenation (gtype_ops.c:153-280).
      // gtype_add only concatenates string with string or NUMBER — other
      // mixes (string+bool, string+list …) ereport in the reference, so
      // refuse them here too rather than silently stringifying.
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        // null operand → null result (gtype_add null propagation — the
        // reference CREATEs through `a.missing + ' -> '` with a null prop,
        // cypher_create.sql:72)
        case (Some(NullType), _) | (_, Some(NullType)) => lit(null)
        case (Some(StringType), Some(StringType)) => concat(l, r)
        // number→text in concat uses float8out's shortest form: an
        // integral double prints bare (`'str' + 1.0` → "str1", expr.out)
        case (Some(StringType), Some(t)) if isNumericLike(t) =>
          concat(l, numConcatText(r, t))
        case (Some(t), Some(StringType)) if isNumericLike(t) =>
          concat(numConcatText(l, t), r)
        case (Some(StringType), _) | (_, Some(StringType)) =>
          throw new UnsupportedOperationException(
            "+ concatenates string with string or number only (gtype_add)")
        // range/multirange union (PG range_union/multirange_union; a
        // disjoint range+range yields the 2-part multirange rather than
        // PG's error — total-function deviation, documented)
        case (Some(lt), Some(rt))
            if rangeKindOf(lt).nonEmpty && rangeKindOf(rt).nonEmpty =>
          val la = if (rangeKindOf(lt) == "range") array(l) else l
          val ra = if (rangeKindOf(rt) == "range") array(r) else r
          val u = graft.functions.RangeGeoFns.multiUnion(la, ra)
          if (lRaw.exists(isConstAst) && rRaw.exists(isConstAst))
            foldConstCol(u, s"range+|${lRaw.get}|${rRaw.get}")
          else u
        // temporal arithmetic (gtype_add temporal branches; temporal.sql:513-523)
        case (Some(t), Some(ivt)) if isTemporalType(t) && isIntervalStruct(ivt) =>
          graft.functions.TemporalFns.shiftTemporal(l, r, 1, ntz = t == TimestampNTZType)
        case (Some(ivt), Some(t)) if isIntervalStruct(ivt) && isTemporalType(t) =>
          graft.functions.TemporalFns.shiftTemporal(r, l, 1, ntz = t == TimestampNTZType)
        case (Some(a), Some(b)) if isIntervalStruct(a) && isIntervalStruct(b) =>
          graft.functions.TemporalFns.addIntervals(l, r, 1)
        // time ± interval (PG time_pl_interval: only the us part of the
        // span moves a time-of-day, wrapping mod 24 h — temporal.sql)
        case (Some(LongType), Some(ivt))
            if isIntervalStruct(ivt) && lRaw.exists(e => isTimeExpr(e, ctx)) =>
          timeShift(l, r, 1)
        case (Some(ivt), Some(LongType))
            if isIntervalStruct(ivt) && rRaw.exists(e => isTimeExpr(e, ctx)) =>
          timeShift(r, l, 1)
        // timetz ± interval: the us part shifts, the written zone stays
        case (Some(tzt), Some(ivt)) if isTimetzStruct(tzt) && isIntervalStruct(ivt) =>
          graft.functions.TemporalFns.timetz(
            timeShift(l.getField("us"), r, 1), l.getField("off"))
        case (Some(ivt), Some(tzt)) if isIntervalStruct(ivt) && isTimetzStruct(tzt) =>
          graft.functions.TemporalFns.timetz(
            timeShift(r.getField("us"), l, 1), r.getField("off"))
        // vector + vector is ELEMENTWISE (gtype_vector_add, vector.out:263+);
        // any other array + array is list concatenation, with mixed
        // dynamic/typed sides re-encoded to the dynamic codec
        case (Some(at @ ArrayType(ae, _)), Some(bt @ ArrayType(be, _))) =>
          if (isVectorOperand(lRaw, at) || isVectorOperand(rRaw, bt))
            zip_with(l, r, (x, y) => x + y)
          else {
            import graft.gvalue.GValueCol
            if (GValueCol.isGValue(ae) != GValueCol.isGValue(be)) {
              val lc = if (GValueCol.isGValue(ae)) l
                else transform(l, e => GValueCol.encode(e, ae))
              val rc = if (GValueCol.isGValue(be)) r
                else transform(r, e => GValueCol.encode(e, be))
              concat(lc, rc)
            } else concat(l, r)
          }
        case _ => l + r
      }
    case "-"  =>
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        case (Some(t), Some(ivt)) if isTemporalType(t) && isIntervalStruct(ivt) =>
          graft.functions.TemporalFns.shiftTemporal(l, r, -1, ntz = t == TimestampNTZType)
        case (Some(a), Some(b)) if isIntervalStruct(a) && isIntervalStruct(b) =>
          graft.functions.TemporalFns.addIntervals(l, r, -1)
        case (Some(LongType), Some(ivt))
            if isIntervalStruct(ivt) && lRaw.exists(e => isTimeExpr(e, ctx)) =>
          timeShift(l, r, -1)
        case (Some(tzt), Some(ivt)) if isTimetzStruct(tzt) && isIntervalStruct(ivt) =>
          graft.functions.TemporalFns.timetz(
            timeShift(l.getField("us"), r, -1), l.getField("off"))
        // vector subtraction (gtype_vector elementwise ops, vector.sql) —
        // numeric-element arrays only; the reference rejects `-` on lists
        case (Some(ArrayType(ae, _)), Some(ArrayType(be, _)))
            if isNumericLike(ae) && isNumericLike(be) =>
          zip_with(l, r, (x, y) => x - y)
        case _ => l - r
      }
    case "*"  =>
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        // interval × number / number × interval (PG interval_mul)
        case (Some(a0), Some(b0)) if isIntervalStruct(a0) && isNumericLike(b0) =>
          graft.functions.TemporalFns.scaleInterval(l, r.cast("double"))
        case (Some(a0), Some(b0)) if isNumericLike(a0) && isIntervalStruct(b0) =>
          graft.functions.TemporalFns.scaleInterval(r, l.cast("double"))
        // vector hadamard product (gtype_vector elementwise ops) —
        // numeric-element arrays only
        case (Some(ArrayType(ae, _)), Some(ArrayType(be, _)))
            if isNumericLike(ae) && isNumericLike(be) =>
          zip_with(l, r, (x, y) => x * y)
        case _ => l * r
      }
    case "||" =>
      // gtype_tsquery_or's runtime tag dispatch, static here: tsvector
      // (lexeme array) || tsvector merges sorted-distinct; tsquery
      // (canonical string) || tsquery is the OR combinator (tsearch.sql:85,143)
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        case (Some(_: ArrayType), Some(_: ArrayType)) =>
          graft.functions.TsearchFns.tsvectorConcat(l, r)
        case (Some(StringType), Some(StringType)) =>
          (lRaw.flatMap(litTsqueryStr), rRaw.flatMap(litTsqueryStr)) match {
            case (Some(a), Some(b)) =>
              lit(graft.functions.TsearchFns.combineTsq(a, b, "|"))
            case _ => graft.functions.TsearchFns.tsqueryCombine(l, r, "|")
          }
        case other => throw new UnsupportedOperationException(s"|| over $other")
      }
    case "&" =>
      // gtype_bitwise_and's runtime tag dispatch: integers bitand, tsquery
      // strings AND-combine (tsearch.sql:148)
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        case (Some(a), Some(b)) if isIntegralType(a) && isIntegralType(b) =>
          l.bitwiseAND(r)
        case (Some(StringType), Some(StringType)) =>
          (lRaw.flatMap(litTsqueryStr), rRaw.flatMap(litTsqueryStr)) match {
            case (Some(a), Some(b)) =>
              lit(graft.functions.TsearchFns.combineTsq(a, b, "&"))
            case _ => graft.functions.TsearchFns.tsqueryCombine(l, r, "&")
          }
        case other => throw new UnsupportedOperationException(s"& over $other")
      }
    case "/" if dataTypeOpt(l, ctx).exists(isIntervalStruct) &&
        dataTypeOpt(r, ctx).exists(isNumericLike) =>
      graft.functions.TemporalFns.scaleInterval(l, lit(1.0) / r.cast("double"))
    case "/"  =>
      // gtype_div (gtype_ops.c:549-554): int / int is TRUNCATING integer
      // division (C semantics, toward zero); any float operand promotes.
      // IntegralDivide (`div`) stays EXACT above 2^53 where a
      // through-double round-trip corrupts the low bits (packed graphids
      // with label id ≥ 32 live there); ANSI mode raises on /0 like the
      // reference's ereport(DIVISION_BY_ZERO).
      // every lane raises PG's DIVISION_BY_ZERO text — float division
      // included (the reference's float8div ereports, no IEEE Infinity
      // escape; old gtype.out gtype_div family)
      val divByZero = raise_error(lit("division by zero"))
      (dataTypeOpt(l, ctx), dataTypeOpt(r, ctx)) match {
        case (Some(a), Some(b)) if isIntegralType(a) && isIntegralType(b) =>
          when(r === 0, divByZero.cast(LongType))
            .otherwise(call_function("div", l, r))
        // numeric division re-scales to PG div_var's 16-fraction display
        // (aggregation.out sum/count → 3.4928571428571429::numeric; Spark's
        // own decimal-division scale rules differ)
        case (Some(a), Some(b))
            if a.isInstanceOf[DecimalType] || b.isInstanceOf[DecimalType] =>
          when(r === 0, divByZero.cast(DecimalType(38, 16)))
            .otherwise((l / r).cast(DecimalType(38, 16)))
        case (Some(DoubleType | FloatType), _) | (_, Some(DoubleType | FloatType)) =>
          when(r === 0, divByZero.cast(DoubleType)).otherwise(l / r)
        case _ => l / r
      }
    case "%"  => l % r
    case "^"  => pow(l, r)
    case "="  => l === r
    case "<>" => l =!= r
    case "<"  => l < r
    case "<=" => l <= r
    case ">"  => l > r
    case ">=" => l >= r
    case "AND" => l && r
    case "OR"  => l || r
    case "XOR" => (l || r) && !(l && r)
    case "IN" => rRaw match {
      case _ if dataTypeOpt(r, ctx).contains(org.apache.spark.sql.types.NullType) =>
        // x IN null → null (lists.sql); an untyped NULL literal can't feed
        // array_contains
        lit(null).cast("boolean")
      case Some(ListLit(items)) if items.forall(_.isInstanceOf[Lit]) &&
        !mixedLitTags(items) =>
        l.isin(items.map { case Lit(g) => gValueToAny(g) }: _*)
      case _ =>
        import graft.gvalue.GValueCol
        val elemGv = dataTypeOpt(r, ctx) match {
          case Some(ArrayType(et, _)) => GValueCol.isGValue(et)
          case _ => false
        }
        if (!elemGv) array_contains(r, l)
        else {
          // heterogeneous (gtype) list: cross-type equality via the gvalue
          // order key, with openCypher 3VL — null needle → null, no match
          // but a null element present → null (lists.sql IN block)
          val needleFromLit = lRaw.flatMap(litGValue).collect {
            case g @ (_: GArray | _: GMap) => GValueCol.gLit(g)
          }
          val needle =
            if (needleFromLit.isDefined) needleFromLit.get
            else if (dataTypeOpt(l, ctx).exists(GValueCol.isGValue)) l
            else {
              val dt = dataTypeOpt(l, ctx).getOrElse(StringType)
              if (GValueCol.canEncode(dt)) GValueCol.encode(l, dt)
              else GValueCol.encode(l.cast("string"), StringType)
            }
          val matched = exists(r, e => coalesce(GValueCol.eqv(e, needle), lit(false)))
          val hasNull = exists(r, e => GValueCol.isNullVal(e))
          when(l.isNull, lit(null).cast("boolean"))
            .when(matched, lit(true))
            .when(hasNull, lit(null).cast("boolean"))
            .otherwise(lit(false))
        }
    }
  })

  private def compileFn(name: String, args: List[Expr], ctx: Ctx,
      inAgg: Boolean = false): Column = {
    // in aggregate context, argument subtrees may contain aggregate calls
    // (size(collect(x)), head(collect(x)) …) — compile them as aggregates
    // internal entity constructors over constant args (vertex.sql/
    // edge.sql): the constG value enters as its gtype container literal
    if (Compiler.entityCtorFns(name.toLowerCase)) {
      constG(FnCall(name, args, distinct = false)) match {
        case Some((v, _)) =>
          return if (inAgg) compileAggExpr(gvalueToAst(v), ctx)
                 else compileExpr(gvalueToAst(v), ctx)
        case None => ()
      }
    }
    // constant PostGIS expressions evaluate driver-side (GeomWkt domain);
    // non-constant or non-geometry inputs fall through to the kernels
    if (Compiler.geomConstFns(name.toLowerCase)) {
      geomConst(FnCall(name, args, distinct = false)) match {
        case Some(v) =>
          return v match {
            // ONLY the ::geometry cast maps a plain 2-D point to the PG
            // point shape (geometric.sql's `'POINT(1 1)'::geometry`
            // feeds the pg operator family); st_* constructors keep the
            // 4-field point the PostGIS kernels read
            case GeomWkt.GPoint(Some(p), GeomWkt.Dim(false, false), 0)
                if name.equalsIgnoreCase("togeometry") =>
              graft.functions.RangeGeoFns.point(lit(p.x), lit(p.y))
            case other => geomLit(other)
          }
        case None => ()
      }
    }
    // constant range/multirange construction folds to a literal tree (the
    // parse-chain + normalization expressions are huge; see foldConstCol)
    if (Compiler.rangeCtorFns(name.toLowerCase) && args.forall(isConstAst))
      return foldConstCol(
        compileFnBody(name, args, ctx, inAgg),
        name.toLowerCase + "|" + args.mkString(";"))
    compileFnBody(name, args, ctx, inAgg)
  }

  private def compileFnBody(name: String, args: List[Expr], ctx: Ctx,
      inAgg: Boolean): Column = {
    def sub(e: Expr): Column =
      if (inAgg) compileAggExpr(e, ctx) else compileExpr(e, ctx)
    def a(i: Int): Column = sub(args(i))
    name match {
      // a bare NULL literal can't choose among the vertex/edge/variadic
      // overloads — PG's ambiguous-function error (old vertex.out
      // `SELECT id(NULL)` → function id(unknown) is not unique)
      case "id" | "label" if args.length == 1 && (args.head match {
          case Lit(GNull) => true; case _ => false }) =>
        throw new IllegalArgumentException(
          s"function $name(unknown) is not unique")
      case "id" | "label" | "type" | "startnode" | "start_id" | "startid" |
           "endnode" | "end_id" | "endid" | "properties"
          if args.nonEmpty && constG(args.head).exists(p =>
            p._1.isInstanceOf[GMap] &&
              p._1.asInstanceOf[GMap].entries.contains("id")) =>
        // accessor over a CONSTANT entity value (build_vertex/build_edge,
        // vertex.sql/edge.sql) — field lookup on the constant map; a
        // missing field (start_id of a vertex) is the reference's error
        val m = constG(args.head).get._1.asInstanceOf[GMap].entries
        val key = name match {
          case "id" => "id"
          case "label" | "type" => "label"
          case "startnode" | "start_id" | "startid" => "start_id"
          case "endnode" | "end_id" | "endid" => "end_id"
          case _ => "properties"
        }
        val v = m.getOrElse(key, throw new IllegalArgumentException(
          s"$name() over an entity without $key"))
        sub(gvalueToAst(v))
      case "id"    => entityField(args.head, "id", ctx)
      case "label" | "type" => entityField(args.head, "label", ctx)
      case "startnode" | "start_id" => entityField(args.head, "start_id", ctx)
      case "endnode" | "end_id"     => entityField(args.head, "end_id", ctx)
      case "properties" => args.head match {
        case Var(v) if ctx.vars.get(v).exists(_.isEntity) => propertiesMap(v, ctx)
        case _ => compileExpr(args.head, ctx)
      }
      case "keys" => args.head match {
        case Var(v) if ctx.vars.get(v).exists(_.isEntity) =>
          array(entityColumns(ctx.df, v)
            .map(_.stripPrefix(s"${v}__"))
            .filterNot(Set("id", "label", "start_id", "end_id"))
            .map(PropNames.unesc).sorted.map(lit): _*)
        case _ => map_keys(a(0))
      }
      case "size" | "length" => args.head match {
        case Var(v) if ctx.vars.get(v).exists(_.kind == VarKind.VlePath) =>
          size(col(s"${v}__ids"))
        case Var(v) if ctx.vars.get(v).exists(_.kind == VarKind.Path) =>
          // length(p) = EDGE count but size(p) = CHILD count (2·edges+1 —
          // traversal_size returns children[0], traversal_length returns
          // (children[0]-1)/2, traversal.c:169-185); VLE segments
          // contribute their per-row hop counts
          val info = ctx.vars(v)
          val (vles, fixed) = info.pathEdges.partition(m =>
            ctx.vars.get(m).exists(_.kind == VarKind.VlePath))
          val edges = vles.foldLeft(lit(fixed.length.toLong): Column)(
            (acc, m) => acc + size(col(s"${m}__ids")).cast("long"))
          if (name == "size") edges * 2 + 1 else edges
        case arg =>
          val c = sub(arg)
          dataTypeOf(c, ctx) match {
            case StringType => length(c)
            case _          => size(c)
          }
      }
      case "head"    =>
        if (dataTypeOpt(a(0), ctx).contains(org.apache.spark.sql.types.NullType)) lit(null)
        else try_element_at(a(0), lit(1))  // [] → null, not error
      case "last"    =>
        if (dataTypeOpt(a(0), ctx).contains(org.apache.spark.sql.types.NullType)) lit(null)
        else try_element_at(a(0), lit(-1))
      case "reverse" => reverse(a(0))
      case "range" =>
        // gtype range(): float bounds truncate to ints; a wrong-sign step
        // yields [] instead of erroring (lists.out:417-439)
        val lo = a(0).cast("long"); val hi = a(1).cast("long")
        if (args.length == 2) sequence(lo, hi)
        else {
          val st = a(2).cast("long")
          when(st === 0 || (st > 0 && hi < lo) || (st < 0 && hi > lo),
            array().cast(ArrayType(LongType)))
            .otherwise(sequence(lo, hi, st))
        }
      case "coalesce" => coalesce(args.map(x => compileExpr(x, ctx)): _*)
      case "abs"   => abs(a(0))
      // gtype ceil/floor return FLOAT unless the input is numeric
      // (gtype_numbers.c:238-282: numeric_ceil else dceil → AGTV_FLOAT;
      // expr.out `ceil(0)` prints 0.0)
      case "ceil" | "ceiling" => dataTypeOpt(a(0), ctx) match {
        case Some(_: DecimalType) => ceil(a(0))
        case _ => ceil(a(0)).cast("double")
      }
      case "floor" => dataTypeOpt(a(0), ctx) match {
        case Some(_: DecimalType) => floor(a(0))
        case _ => floor(a(0)).cast("double")
      }
      // 2-arg round is numeric_round: returns NUMERIC at the requested
      // display scale (expr.out `round(7, 2)` → 7.00::numeric; a float
      // scale truncates to int)
      case "round" if args.length == 2 => args(1) match {
        case Lit(GInt(n))   => round(a(0), n.toInt).cast(DecimalType(38, math.max(n.toInt, 0)))
        case Lit(GFloat(f)) => round(a(0), f.toInt).cast(DecimalType(38, math.max(f.toInt, 0)))
        case Lit(GNull)     => lit(null)
        case _ => // dynamic scale: scale-shift round (Spark round wants a literal)
          val s = a(1).cast("int")
          round(a(0) * pow(lit(10.0), s)) / pow(lit(10.0), s)
      }
      // 1-arg round on the float lane is PG dround = rint: HALF-EVEN, and
      // the result is FLOAT (expr.out round(4.5) → 4.0, round(0) → 0.0);
      // numeric input keeps numeric (numeric_round scale 0)
      case "round" => dataTypeOpt(a(0), ctx) match {
        case Some(_: DecimalType) => round(a(0))
        case _ => bround(a(0)).cast("double")
      }
      case "sign"  => signum(a(0))
      case "sqrt"  => sqrt(a(0))
      case "cbrt"  => cbrt(a(0))
      case "exp"   => exp(a(0))
      case "log"   => log(a(0))
      case "log10" => log10(a(0))
      case "sin"   => sin(a(0)); case "cos" => cos(a(0)); case "tan" => tan(a(0))
      case "asin"  => asin(a(0)); case "acos" => acos(a(0)); case "atan" => atan(a(0))
      // hyperbolic + cotangent family (gtype_numbers.c / PG float8 fns —
      // postgraph-number-functions.sql.in:45-95; r11 catalog-audit gap)
      case "sinh"  => sinh(a(0)); case "cosh" => cosh(a(0)); case "tanh" => tanh(a(0))
      case "asinh" => asinh(a(0)); case "acosh" => acosh(a(0)); case "atanh" => atanh(a(0))
      case "cot"   => cot(a(0))
      // the reference's atan2(a, b) computes atan2(y=b, x=a) — argument
      // order SWAPPED vs the C convention (gtype_numbers.c:101-112
      // DirectFunctionCall2(datan2, y, x) with y = arg 1)
      case "atan2" => atan2(a(1), a(0))
      // factorial is PG numeric (expr.out `3628800::numeric`); gcd/lcm
      // promote to numeric when EITHER arg is float/numeric/string
      // (gtype_gcd, gtype_numbers.c:142-163 — numeric_gcd branch),
      // staying int only for int pairs
      case "factorial" => factorial(a(0).cast("int")).cast(DecimalType(38, 0))
      case "gcd" | "lcm" =>
        val k = if (name == "gcd") graft.functions.MathKernels.gcd _
          else graft.functions.MathKernels.lcm _
        // numeric lane only for float/numeric operands — STRINGS cast to
        // the int lane (expr.out `gcd('10', 5)` → 5, not 5::numeric)
        val numericLane = Seq(a(0), a(1)).exists(c => dataTypeOpt(c, ctx)
          .exists {
            case DoubleType | FloatType | _: DecimalType => true
            case t => graft.gvalue.GValueCol.isGValue(t)
          })
        val r = k(a(0).cast("long"), a(1).cast("long"))
        if (numericLane) r.cast(DecimalType(38, 0)) else r
      case "pi"    => lit(math.Pi)
      case "e"     => exp(lit(1.0))
      case "degrees" => degrees(a(0))
      case "radians" => radians(a(0))
      case "toupper" | "upper" => upper(a(0))
      case "tolower" | "lower" => lower(a(0))
      case "trim"  => trim(a(0))
      case "ltrim" => ltrim(a(0))
      case "rtrim" => rtrim(a(0))
      case "left" => // PG left(): negative n drops that many from the END
        val n = a(1).cast("int")
        when(n >= 0, a(0).substr(lit(1), n))
          .otherwise(a(0).substr(lit(1), greatest(length(a(0)) + n, lit(0))))
      case "right" => // PG right(): n > len whole string; negative drops from FRONT
        val n = a(1).cast("int")
        when(n >= 0, a(0).substr(greatest(length(a(0)) - n + 1, lit(1)), length(a(0))))
          .otherwise(a(0).substr(-n + 1, length(a(0))))
      // wrong arity resolves to NO catalog entry in the reference
      // (old expr.out `substring("123456789")` → function
      // postgraph.substring(gtype) does not exist)
      case "split" | "substring" if args.length < 2 =>
        throw new IllegalArgumentException(
          s"function postgraph.$name(gtype) does not exist")
      case "replace" if args.length < 3 =>
        throw new IllegalArgumentException(s"function postgraph.replace(" +
          Seq.fill(args.length)("gtype").mkString(", ") + ") does not exist")
      case "replace" => (args(1), args(2)) match {
        // literal search/replacement keeps the codegen'd regex path
        case (Lit(GString(_)), Lit(GString(_))) =>
          regexp_replace(a(0), regexp_quote(args(1)), litString(args(2)))
        case _ =>
          call_function("replace", a(0).cast("string"), a(1).cast("string"),
            a(2).cast("string"))
      }
      case "split" => args(1) match {
        // empty delimiter: PG text_to_array splits to chars with no
        // trailing empty (expr.out split("a,b", "") → ["a", ",", "b"]) —
        // the (?!$) lookahead matches every inter-char gap except the end
        case Lit(GString("")) => split(a(0), "(?!$)")
        case Lit(GString(_)) => split(a(0), regexp_quote(args(1)))
        case _ => // dynamic delimiter: regex-escape it columnwise
          val sep = a(1).cast("string")
          when(length(sep) === 0, split(a(0).cast("string"), "(?!$)"))
            .otherwise(split(a(0).cast("string"),
              regexp_replace(sep, "([^a-zA-Z0-9])", "\\\\$1")))
      }
      case "substring" =>
        // the reference's substring is PG text_substr: 1-BASED, a start
        // below 1 consumes length before the string begins (expr.out
        // substring("0123456789", 0, 1) → "", (1,3) → "012"); a NULL
        // start/len is strict-NULL (greatest() would silently skip it)
        if (args.length == 3) {
          val start = a(1).cast("int"); val len = a(2).cast("int")
          val begin = greatest(start, lit(1))
          when(start.isNull || len.isNull, lit(null).cast("string"))
            .otherwise(a(0).substr(begin, greatest(start + len - begin, lit(0))))
        }
        else {
          val start = a(1).cast("int")
          when(start.isNull, lit(null).cast("string"))
            .otherwise(a(0).substr(greatest(start, lit(1)), length(a(0))))
        }
      case "initcap" => initcap(a(0))
      case "tostring" =>
        val c = a(0)
        dataTypeOpt(c, ctx) match {
          case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
            graft.gvalue.GValueCol.render(c)
          case Some(_: DecimalType) =>
            // numeric_out strips fixed-storage padding (toString(3.14::
            // numeric) is "3.14", not the (38,18) expansion)
            val s = c.cast("string")
            when(s.contains("."),
              regexp_replace(regexp_replace(s, "0+$", ""), "\\.$", ""))
              .otherwise(s)
          case _ => c.cast("string")
        }
      case "tointeger" => dataTypeOpt(a(0), ctx) match {
        // int casts round, not truncate (PG dtoi8/numeric_int8); NaN/±Inf
        // and magnitudes past int8 raise PG's range error (old expr.out
        // `'NaN'::float::int` → bigint out of range)
        case Some(DoubleType | FloatType) =>
          // bround = HALF_EVEN: PG's float8→int8 (dtoi8) goes through
          // rint(), banker's rounding — toInteger(2.5) is 2, not 3; the
          // constant-fold path (constG GFloat) already rounds half-even
          // (ADVICE r10)
          when(isnan(a(0)) || abs(a(0)) > lit(9.223372036854776e18),
            raise_error(lit("bigint out of range")).cast("long"))
            .otherwise(bround(a(0)).cast("long"))
        case Some(_: DecimalType) =>
          // numeric_int8 stays HALF_UP (PG numeric rounds half-away-from-0)
          round(a(0)).cast("long")
        // int8in rejects non-integer text with PG's message (old expr.out
        // `'0.0'::int` → invalid input syntax for type bigint: "0.0")
        case Some(StringType) =>
          when(trim(a(0)).rlike("^[+-]?[0-9]+$"), a(0).cast("long"))
            .otherwise(raise_error(format_string(
              "invalid input syntax for type bigint: \"%s\"", a(0))).cast("long"))
        case _ => a(0).cast("long")
      }
      case "tofloat"   => dataTypeOpt(a(0), ctx) match {
        // float8in validates its text with PG's message (old expr.out
        // `'2:71'::float` → invalid input syntax for type double
        // precision: "2:71"); ±Infinity/NaN spellings pass
        case Some(StringType) =>
          val ok = trim(a(0)).rlike(
            "^(?i)([+-]?(inf(inity)?|nan)|[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?)$")
          when(ok, a(0).cast("double"))
            .otherwise(raise_error(format_string(
              "invalid input syntax for type double precision: \"%s\"", a(0)))
              .cast("double"))
        case _ => a(0).cast("double")
      }
      case "toboolean" => dataTypeOpt(a(0), ctx) match {
        // gtype_to_bool accepts only true/false text and rejects
        // containers with the reference's messages (old gtype.out
        // gtype_to_bool block)
        case Some(StringType) =>
          when(lower(trim(a(0))).isin("true", "false"), a(0).cast("boolean"))
            .otherwise(raise_error(
              lit("cannot cast gtype string to type boolean")).cast("boolean"))
        case Some(_: ArrayType | _: MapType | _: StructType) =>
          throw new IllegalArgumentException(
            "cannot cast non-scalar gtype to bool")
        case _ => a(0).cast("boolean")
      }
      case "tonumeric" => args.head match {
        // PG numeric accepts ±Infinity/NaN spellings (numeric.c, PG14+);
        // DecimalType cannot hold them, so ±Inf rides a reserved sentinel
        // decimal the render maps back to Infinity::numeric (old expr.out
        // `('inf'::numeric)::numeric` → Infinity::numeric); NaN rides the
        // double family
        case Lit(GString(s))
            if s.trim.toLowerCase.matches("[+-]?(inf|infinity|nan)") =>
          val t = s.trim.toLowerCase
          if (t == "nan") lit(Double.NaN)
          else if (t.startsWith("-"))
            lit(graft.gvalue.PgOut.NumericNegInf)
          else lit(graft.gvalue.PgOut.NumericInf)
        case _ => dataTypeOpt(a(0), ctx) match {
          // float8_numeric goes through float8out's 15-significant-digit
          // text, not the raw binary value (expr.out `((1+2.71)*3)::
          // numeric` → 11.13, not 11.129999999999999); ±Inf/NaN can't
          // live in DecimalType → NULL
          case Some(DoubleType | FloatType) =>
            when(isnan(a(0)) || a(0) === Double.PositiveInfinity ||
              a(0) === Double.NegativeInfinity, lit(null).cast("decimal(38,18)"))
              .otherwise(format_string("%.15g", a(0)).cast("decimal(38,18)"))
          // numeric_in validates its text with PG's message (old expr.out
          // `'2:71'::numeric` → invalid input syntax for type numeric)
          case Some(StringType) =>
            // numeric_in also accepts the Inf/Infinity/NaN spellings (PG14+)
            // — a column-valued 'NaN' must not raise where the literal path
            // succeeds (ADVICE r10). ±Inf rides the same sentinel decimals
            // as the literal branch; NaN can't live in DecimalType → NULL
            // (the float-lane convention above)
            val t0 = lower(trim(a(0)))
            val ok = trim(a(0)).rlike(
              "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")
            when(t0.isin("nan", "+nan", "-nan"), lit(null).cast("decimal(38,18)"))
              .when(t0.isin("inf", "infinity", "+inf", "+infinity"),
                lit(graft.gvalue.PgOut.NumericInf))
              .when(t0.isin("-inf", "-infinity"),
                lit(graft.gvalue.PgOut.NumericNegInf))
              .when(ok, a(0).cast("decimal(38,18)"))
              .otherwise(raise_error(format_string(
                "invalid input syntax for type numeric: \"%s\"", a(0)))
                .cast("decimal(38,18)"))
          case _ => a(0).cast("decimal(38,18)")
        }
      }
      // temporal fns (reference gtype_temporal.c, callable from Cypher)
      case "extract" | "date_part" =>
        // EXTRACT returns PG NUMERIC with a field-specific display scale
        // (epoch/seconds 6, ms 3, else 0 — temporal.out `17::numeric`,
        // `16.000000::numeric`); date_part returns float8 (`17.0`)
        val base = pgDatePart(litString(args(0)), a(1), ctx)
        // float8 throughout: Spark's own date_part returns ints/decimals
        // per field, PG's is uniformly float8 (temporal.out `17.0`)
        if (name == "date_part") base.cast("double")
        // EXTRACT(JULIAN) is exact PG numeric division, not a float8
        // round-trip (temporal.out:2305 carries the repeating 296… at
        // 20 fraction digits)
        else if (litString(args(0)).equalsIgnoreCase("julian"))
          graft.functions.TemporalFns.julianNumeric(a(1))
        else {
          val scale = litString(args(0)).toLowerCase match {
            case "epoch" | "second" | "seconds" => 6
            case "milliseconds" => 3
            case _ => 0
          }
          base.cast(DecimalType(38, scale))
        }
      // 3-arg form truncates in the GIVEN zone (timestamptz_trunc_zone —
      // temporal.out date_trunc('day', tstz, 'Australia/Sydney') →
      // Dec 16 13:00 GMT): shift to zone wall-clock, trunc, shift back
      case "date_trunc" if args.length == 3 =>
        val zone = litString(args(2))
        to_utc_timestamp(
          date_trunc(litString(args(0)), from_utc_timestamp(a(1), zone)), zone)
      case "date_trunc" => dataTypeOpt(a(1), ctx) match {
        case Some(t) if isIntervalStruct(t) =>
          // truncate an interval: zero every field below the target
          val iv = a(1)
          litString(args(0)).toLowerCase match {
            case "year"  => graft.functions.TemporalFns.interval(
              (iv.getField("months") / 12).cast("int") * 12, lit(0), lit(0L))
            case "month" => graft.functions.TemporalFns.interval(
              iv.getField("months"), lit(0), lit(0L))
            case "day"   => graft.functions.TemporalFns.interval(
              iv.getField("months"), iv.getField("days"), lit(0L))
            case "hour"  => graft.functions.TemporalFns.interval(
              iv.getField("months"), iv.getField("days"),
              (iv.getField("us") / 3600000000L).cast("long") * 3600000000L)
            case "minute" => graft.functions.TemporalFns.interval(
              iv.getField("months"), iv.getField("days"),
              (iv.getField("us") / 60000000L).cast("long") * 60000000L)
            case other => throw new UnsupportedOperationException(
              s"date_trunc('$other', interval)")
          }
        case _ =>
          val t = date_trunc(litString(args(0)), a(1))
          // Spark's date_trunc yields an instant — a plain-TIMESTAMP (NTZ)
          // or date input must stay NTZ (temporal.out: no GMT abbrev)
          dataTypeOpt(a(1), ctx) match {
            case Some(TimestampNTZType | DateType) => t.cast("timestamp_ntz")
            case _ => t
          }
      }
      case "date_bin" =>
        val bin = args(0) match {
          // stride as an integer literal (seconds) or any interval expression
          case Lit(graft.gvalue.GInt(v)) =>
            graft.functions.TemporalFns.dateBin(v, a(1), a(2))
          case _ =>
            val iv = a(0)
            graft.functions.TemporalFns.dateBinUs(
              iv.getField("us") + iv.getField("days").cast("long") * 86400000000L,
              a(1), a(2))
        }
        // PRESERVE the source's timestamp kind: a plain TIMESTAMP (NTZ)
        // or date input yields plain timestamp (renders without the zone
        // abbrev); a timestamptz or string input coerces to the instant
        // kind (temporal.out `date_bin(…, '…+08', …)` renders GMT)
        dataTypeOpt(a(1), ctx) match {
          case Some(TimestampNTZType | DateType) => bin.cast("timestamp_ntz")
          case _ => bin
        }
      // PG make_date(-44, …) means 44 BC — astronomical year -43 (no
      // year 0); make_timestamp returns a PLAIN (NTZ) timestamp.
      // Field ranges validate EAGERLY with PG's exact message (date.c
      // errmsg "date field value out of range: %d-%02d-%02d" — old
      // temporal.out make_date(2013, 2, 30) etc.)
      case "make_date" =>
        val (y, m, d) = (a(0).cast("int"), a(1).cast("int"), a(2).cast("int"))
        val leap = (y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0
        val daysIn = when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
          .when(m.isin(4, 6, 9, 11), 30)
          .when(m === 2, when(leap, 29).otherwise(28))
          .otherwise(0)
        val bad = m < 1 || m > 12 || d < 1 || d > daysIn
        val err = raise_error(format_string(
          "date field value out of range: %d-%02d-%02d", y, m, d))
        when(bad, err.cast(DateType)).otherwise(make_date(
          when(y < 0, y + lit(1)).otherwise(y), m, d))
      case "make_timestamp" => call_function("make_timestamp",
        a(0), a(1), a(2), a(3), a(4), a(5)).cast("timestamp_ntz")
      case "make_timestamptz" =>
        if (args.length >= 7) {
          // PG resolves bare zone ABBREVIATIONS (KST, PST, …) from its
          // default abbrev list; Java only takes region ids/offsets — map
          // the common PG abbreviations to fixed offsets (PG's defaults)
          val zoneAbbrevs = Map(
            "KST" -> "+09:00", "JST" -> "+09:00", "EST" -> "-05:00",
            "EDT" -> "-04:00", "CST" -> "-06:00", "CDT" -> "-05:00",
            "MST" -> "-07:00", "MDT" -> "-06:00", "PST" -> "-08:00",
            "PDT" -> "-07:00", "GMT" -> "+00:00", "UTC" -> "+00:00",
            "CET" -> "+01:00", "CEST" -> "+02:00", "IST" -> "+05:30",
            "AEST" -> "+10:00", "BST" -> "+01:00")
          val tzc = zoneAbbrevs.foldLeft(a(6)) { case (c, (abbr, off)) =>
            when(upper(c) === abbr, lit(off)).otherwise(c)
          }
          call_function("make_timestamp", a(0), a(1), a(2), a(3), a(4), a(5), tzc)
        } else call_function("make_timestamp", a(0), a(1), a(2), a(3), a(4), a(5))
      case "make_time" => // time-of-day micros (the engine's time encoding)
        a(0).cast("long") * 3600000000L + a(1).cast("long") * 60000000L +
          (a(2).cast("double") * 1e6).cast("long")
      // age(ts, ts) returns a PG INTERVAL (timestamp_age symbolic diff —
      // temporal.out `@ 9 years 5 mons 26 days 5 hours 8 mins 3.89 secs
      // ago`), not the bare parts triple
      case "age" => graft.functions.TemporalFns.ageInterval(a(0), a(1))
      case "justify_hours" => graft.functions.TemporalFns.justifyHours(a(0))
      case "justify_days" => graft.functions.TemporalFns.justifyDays(a(0))
      case "justify_interval" => graft.functions.TemporalFns.justifyInterval(a(0))
      case "isfinite" => // PG ±infinity timestamps map to the parse sentinels
        when(a(0).isNull, lit(null))
          .otherwise(!a(0).cast("string").isin("9999-12-31 23:59:59.999999",
            "0001-01-01 00:00:00",
            // date sentinels ('infinity'::date — temporal.out isfinite f)
            "9999-12-31", "0001-01-01"))
      case "overlaps" =>
        // (s1,e1) OVERLAPS (s2,e2) or the 4-arg fn form. An interval
        // endpoint means start+interval; reversed bounds are swapped
        // (PG's OVERLAPS normalization), then s1 < e2 AND s2 < e1.
        val flat = if (args.length == 2) args.flatMap {
          case FnCall("_row2", List(x, y), _) => List(x, y)
          case other => List(other)
        } else args
        require(flat.length == 4, "overlaps expects two (start, end) pairs")
        // timetz endpoints flatten to UTC-normalized micros up front so
        // endpoint arithmetic/ordering below is uniform
        val cs = flat.map(sub).map { c =>
          dataTypeOpt(c, ctx) match {
            case Some(t) if isTimetzStruct(t) =>
              c.getField("us") - c.getField("off").cast("long") * 1000000L
            case _ => c
          }
        }
        def norm(si: Int, ei: Int): (Column, Column) = {
          val s0 = cs(si)
          val e0 = dataTypeOpt(cs(ei), ctx) match {
            case Some(t) if isIntervalStruct(t) =>
              dataTypeOpt(s0, ctx) match {
                // time (micros-of-day) + interval: add the time part
                case Some(LongType) => s0 + cs(ei).getField("us")
                case _ => graft.functions.TemporalFns.shiftTemporal(s0, cs(ei), 1)
              }
            case _ => cs(ei)
          }
          (least(s0, e0), greatest(s0, e0))
        }
        val (s1, e1) = norm(0, 1); val (s2, e2) = norm(2, 3)
        s1 < e2 && s2 < e1
      // vector fns (reference vector.c — the `<->`/`<#>`/`<=>` operator
      // bodies, callable by name from Cypher like the SQL catalog names)
      case "l2_distance" => graft.functions.VectorFns.l2Distance(a(0), a(1))
      case "l2_squared_distance" => graft.functions.VectorFns.l2Squared(a(0), a(1))
      case "l1_distance" => graft.functions.VectorFns.l1Distance(a(0), a(1))
      case "inner_product" => graft.functions.VectorFns.innerProduct(a(0), a(1))
      case "negative_inner_product" => graft.functions.VectorFns.negativeInnerProduct(a(0), a(1))
      case "cosine_distance" => graft.functions.VectorFns.cosineDistance(a(0), a(1))
      case "spherical_distance" => graft.functions.VectorFns.sphericalDistance(a(0), a(1))
      case "dims" => graft.functions.VectorFns.dims(a(0))
      case "norm" => graft.functions.VectorFns.norm(a(0))
      // extended-type casts (reference gtype_typecasting.c to*() family)
      case "tovector"   => graft.functions.VectorFns.tovector(a(0))
      // ------------------------------------------------ gtype SQL surface
      // `::gtype` = gtype_in (gtype.c gtype_in / gtype_typecasting.c): a
      // string literal parses as a gtype value literal (with ::numeric/
      // ::int scalar annotations); any other input already IS a gtype —
      // the engine's value surface — so the cast is identity.
      case "togtype" => args.head match {
        // desugar the parsed value back to literal AST so container
        // compilation reuses the ListLit/MapLit machinery (incl. the
        // heterogeneous dynamic encoding)
        case Lit(GString(s)) => sub(gvalueToAst(GValue.parseRender(s)))
        // reference defect replicated: path→gtype reinterprets the PATH
        // varlena from byte 0 as a POINT — x = (vl_len_, npts) read as a
        // double (old geometric.out:105 `'[(1,1), (2,2)]'::path::gtype` →
        // `(4.243991677e-314,0)`, the denormal whose bit pattern is
        // (16+16·npts)<<2 | npts<<32), y = the (closed, pad) pair = 0
        case FnCall("topath", List(Lit(GString(s))), _) =>
          val npts = "\\(".r.findAllIn(s).length.toLong
          val vlLen = (16L + 16L * npts) << 2
          struct(
            lit(java.lang.Double.longBitsToDouble(vlLen | (npts << 32))).as("x"),
            lit(0.0).as("y"))
        case _ => a(0)
      }
      case "gtype_in" => compileFn("togtype", args, ctx, inAgg)
      // arithmetic C entry points desugar to the operators they back
      // (gtype_ops.c catalog pairs)
      case "gtype_add" | "gtype_sub" | "gtype_mul" | "gtype_div" |
           "gtype_mod" | "gtype_pow" =>
        val op = name match {
          case "gtype_add" => "+"; case "gtype_sub" => "-"
          case "gtype_mul" => "*"; case "gtype_div" => "/"
          case "gtype_mod" => "%"; case "gtype_pow" => "^"
        }
        val gargs = args.map(e => FnCall("togtype", List(e), distinct = false))
        sub(Bin(op, gargs(0), gargs(1)))
      case "gtype_neg" =>
        sub(Un("NEG", FnCall("togtype", args, distinct = false)))
      case "gtype_contains" =>
        sub(Bin("@>", FnCall("togtype", List(args(0)), distinct = false),
          FnCall("togtype", List(args(1)), distinct = false)))
      case "gtype_exists" =>
        sub(Bin("?", FnCall("togtype", List(args(0)), distinct = false),
          FnCall("togtype", List(args(1)), distinct = false)))
      case "gtype_exists_any" =>
        sub(Bin("?|", FnCall("togtype", List(args(0)), distinct = false),
          FnCall("togtype", List(args(1)), distinct = false)))
      case "gtype_exists_all" =>
        sub(Bin("?&", FnCall("togtype", List(args(0)), distinct = false),
          FnCall("togtype", List(args(1)), distinct = false)))
      case "gtype_string_match_starts_with" | "gtype_string_match_ends_with" |
           "gtype_string_match_contains" =>
        val sop = name match {
          case "gtype_string_match_starts_with" => "STARTS"
          case "gtype_string_match_ends_with"   => "ENDS"
          case _                                => "CONTAINS"
        }
        sub(StringOp(sop, FnCall("togtype", List(args(0)), distinct = false),
          FnCall("togtype", List(args(1)), distinct = false)))
      case "gtype_to_bool" =>
        compileFn("toboolean", List(FnCall("togtype", args, distinct = false)), ctx, inAgg)
      case "bool_to_gtype" | "graphid_to_gtype" | "gtype_to_graphid" => a(0)
      case "gtype_to_text" =>
        compileFn("tostring", List(FnCall("togtype", args, distinct = false)), ctx, inAgg)
      case "gtype_to_int8" | "gtype_to_int4" | "gtype_to_int2" =>
        compileFn("tointeger", List(FnCall("togtype", args, distinct = false)), ctx, inAgg)
      case "gtype_to_float8" | "gtype_to_float4" =>
        compileFn("tofloat", List(FnCall("togtype", args, distinct = false)), ctx, inAgg)
      case "gtype_to_numeric" =>
        compileFn("tonumeric", List(FnCall("togtype", args, distinct = false)), ctx, inAgg)
      case "gtype_to_text_array" | "gtype_to_int8_array" | "gtype_to_int4_array" |
           "gtype_to_int2_array" | "gtype_to_numeric_array" |
           "gtype_to_float8_array" | "gtype_to_float4_array" =>
        // literal-array casts to SQL arrays (gtype_typecasting.c *_array):
        // the result is a POSTGRES array — `{1,2,3}` array_out text, with
        // numeric→int ROUNDING half-up (gtype.out {2,2,4} for
        // [1.6,2.3,3.66]) — not a gtype list
        constG(args(0)).map(_._1) match {
          case Some(GArray(items)) =>
            def bd(v: GValue): java.math.BigDecimal = v match {
              case GInt(i)     => java.math.BigDecimal.valueOf(i)
              case GFloat(f)   => new java.math.BigDecimal(f.toString)
              case GNumeric(n) => n.bigDecimal
              case GString(s)  => new java.math.BigDecimal(s.trim)
              case other => throw new IllegalArgumentException(
                s"cannot cast ${other.render} to a numeric array element")
            }
            def quoteIfNeeded(s: String): String =
              if (s.isEmpty || s.exists(c => ",{}\"\\ ".contains(c)))
                "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
              else s
            val elems = items.map { v =>
              name match {
                case "gtype_to_text_array" => v match {
                  case GString(s) => quoteIfNeeded(s)
                  case GFloat(f)  => graft.gvalue.PgOut.pgFloat(f)
                  case other      => other.render
                }
                case n if n.contains("int") =>
                  bd(v).setScale(0, java.math.RoundingMode.HALF_UP)
                    .toBigInteger.toString
                case n if n.contains("float") =>
                  graft.gvalue.PgOut.pgFloat(bd(v).doubleValue())
                case _ => bd(v).stripTrailingZeros.toPlainString // numeric
              }
            }
            lit(elems.mkString("{", ",", "}"))
          case Some(other) => throw new IllegalArgumentException(
            s"cannot cast gtype ${other.render} to array")
          case None => throw new UnsupportedOperationException(
            s"$name needs a gtype literal, got ${args(0)}")
        }
      case "gtype_hash_cmp" =>
        // bit-exact reimplementation of the reference's token-walk hash
        // (gtype.c:1965-2000 + PG's lookup3 family — GtypeHash) so hash
        // values match the goldens; SQL NULL (a null DATUM, not gtype
        // null) hashes to 0 (gtype.out `gtype_hash_cmp(NULL)` → 0)
        args.head match {
          case Lit(GNull) => lit(0)
          case Lit(GString(s)) =>
            lit(graft.gvalue.GtypeHash.hashCmp(GValue.parseRender(s)))
          case e => constG(e).map(_._1) match {
            case Some(v) => lit(graft.gvalue.GtypeHash.hashCmp(v))
            case None => hash(sub(args.head))
          }
        }
      case "gtype_btree_cmp" =>
        def asG(e: Expr): Option[GValue] = e match {
          case Lit(GString(s)) => Some(GValue.parseRender(s))
          case other => constG(other).map(_._1)
        }
        // a SQL NULL datum (bare NULL literal, not gtype null) sorts
        // LAST: (NULL, NULL) → 0, (NULL, x) → 1, (x, NULL) → -1
        // (gtype_btree_cmp ARGISNULL ladder, gtype.c:2005-2015)
        (args(0), args(1)) match {
          case (Lit(GNull), Lit(GNull)) => lit(0L)
          case (Lit(GNull), _)          => lit(1L)
          case (_, Lit(GNull))          => lit(-1L)
          case _ => (asG(args(0)), asG(args(1))) match {
            case (Some(x), Some(y)) =>
              lit(Integer.signum(GValue.cmp(x, y)).toLong)
            case _ => throw new UnsupportedOperationException(
              "gtype_btree_cmp needs gtype literals")
          }
        }
      case "_pg_array_cast" =>
        // '{e1, e2}'::type[] — split the PG array literal driver-side and
        // run each element through the type's cast kernel, so temporal
        // element parsing stays in the shared Column paths
        val base = litString(args(1))
        args.head match {
          case Lit(GString(s)) =>
            val items = pgArrayElems(s)
            if (base == "gtype")
              sub(gvalueToAst(GArray(items.map(GValue.parseRender).toVector)))
            else if (base == "numeric")
              // numeric literals keep their AUTHORED scale — DIRECTLY via
              // the gvalue codec, whose numeric lane stores exact text per
              // element (both a typed decimal array and the AST round-trip
              // would unify every element to one common scale; expr.out
              // `'{1.0, 2}'::numeric[]` → [1.0::numeric, 2::numeric])
              graft.gvalue.GValueCol.gLit(GArray(items.map(e =>
                GNumeric(BigDecimal(e.trim))).toVector))
            else if (base == "time" || base == "timetz")
              // time elements render as their PG text inside the gtype
              // array (expr.out `'{"07:37:16.00+00"}'::time[]` →
              // ["07:37:16"]; timetz KEEPS its written offset →
              // ["07:37:16+04"] — a bare micros long can't render itself)
              array(items.map { e =>
                val t = e.trim.stripPrefix("\"").stripSuffix("\"")
                val offPat = "([+-])(\\d{1,2})(?::(\\d{2}))?$".r
                val off = offPat.findFirstMatchIn(t).map { m =>
                  val sgn = if (m.group(1) == "-") -1 else 1
                  sgn * (m.group(2).toInt * 3600 +
                    Option(m.group(3)).map(_.toInt * 60).getOrElse(0))
                }
                val noTz = t.replaceAll("[+-]\\d{1,2}(:\\d{2})?$", "")
                val lt = java.time.LocalTime.parse(
                  if (noTz.count(_ == ':') == 1) noTz + ":00" else noTz)
                val us = lt.toNanoOfDay / 1000L
                if (base == "timetz")
                  lit(graft.gvalue.PgOut.pgTimeTz(us, off.getOrElse(0)))
                else lit(graft.gvalue.PgOut.pgTime(us))
              }: _*)
            else
              array(items.map(e =>
                compileFn(Parser.castFnFor(base), List(Lit(GString(e))), ctx, inAgg)): _*)
          case other => throw new UnsupportedOperationException(
            s"::$base[] needs a string literal, got $other")
        }
      case "toinet" | "tocidr" => dataTypeOpt(a(0), ctx) match {
        // already an inet struct (e.g. `toinet(x)::inet` re-cast) → identity
        case Some(t) if isInetStruct(t) => a(0)
        case _ => graft.functions.NetworkFns.toInet(a(0))
      }
      case "totsvector" => args.head match {
        // tsvector_in literal syntax ('w':4A,3B a:8 — quoted lexemes,
        // position/weight lists) parses driver-side; plain text keeps the
        // codegen'd split path
        case Lit(GString(s)) if s.contains("'") || s.contains(":") =>
          val lex = graft.functions.TsearchFns.tsvectorInLexemes(s)
          array(lex.map(lit): _*)
        case _ => graft.functions.TsearchFns.toTsvector(a(0))
      }
      case "todate"      => dataTypeOpt(a(0), ctx) match {
        case Some(StringType) => pgTimestampParse(a(0), tz = false).cast("date")
        case _ => a(0).cast("date")
      }
      // timestamp and timestamptz are DISTINCT types (gtype.h
      // GT_HEADER_TIMESTAMPTZ): plain timestamp is wall-clock — an input
      // offset is DROPPED (PG timestamp_in), carried as TIMESTAMP_NTZ;
      // timestamptz is an instant — the offset shifts to UTC, carried as
      // TIMESTAMP (session zone is UTC). Cross-casts follow PG: tstz→ts
      // takes the session-zone wall clock, ts→tstz assumes session zone.
      case "totimestamp" => dataTypeOpt(a(0), ctx) match {
        // PG accepts several datetime input styles (MM/DD/YYYY, day-name
        // forms) beyond ISO — try them in order (datetime.c input parsing)
        case Some(StringType) => pgTimestampParse(a(0), tz = false)
        // numeric input counts MICROSECONDS from the PG epoch 2000-01-01
        // (gtype_typecasting.c int→timestamp; temporal.out `0::timestamp`
        // → `Sat Jan 01 00:00:00 2000`)
        case Some(t) if isNumericLike(t) =>
          timestamp_micros(a(0).cast("long") + lit(PgEpochUs)).cast("timestamp_ntz")
        case _ => a(0).cast("timestamp").cast("timestamp_ntz")
      }
      case "totimestamptz" => dataTypeOpt(a(0), ctx) match {
        case Some(StringType) => pgTimestampParse(a(0), tz = true)
        case Some(t) if isNumericLike(t) =>
          timestamp_micros(a(0).cast("long") + lit(PgEpochUs))
        case _ => a(0).cast("timestamp")
      }
      case "tomacaddr"   => dataTypeOpt(a(0), ctx) match {
        // macaddr travels as a 48-bit long: a long input is either already
        // a macaddr (identity) or a macaddr8 with the FF:FE splice (PG
        // macaddr8tomacaddr) — dispatch on the splice pattern
        case Some(t) if isIntegralType(t) =>
          when(shiftright(a(0), 24).bitwiseAND(lit(0xFFFFL)) === 0xFFFEL,
            graft.functions.NetworkFns.macaddr8ToMacaddr(a(0))).otherwise(a(0))
        case _ => graft.functions.NetworkFns.toMacaddr(a(0))
      }
      case "tomacaddr8"  => dataTypeOpt(a(0), ctx) match {
        // macaddr (long) → macaddr8: splice FF:FE into the middle (PG
        // macaddrtomacaddr8); an 8-byte long would round-trip wrongly but
        // the cast is only reachable from macaddr/text inputs
        case Some(t) if isIntegralType(t) =>
          // an ALREADY-spliced macaddr8 (FF:FE at bits 24-39) round-trips
          // unchanged — `tomacaddr8(x)::macaddr8` must not splice twice
          when(shiftright(a(0), 24).bitwiseAND(lit(0xFFFFL)) === 0xFFFEL, a(0))
            .otherwise(shiftleft(shiftright(a(0), 24), 40)
              .bitwiseOR(lit(0xFFFEL << 24)).bitwiseOR(a(0).bitwiseAND(lit(0xFFFFFFL))))
        case _ => graft.functions.NetworkFns.toMacaddr8(a(0))
      }
      case "abbrev" if args.headOption.exists {
          case FnCall("tocidr", _, _) => true; case _ => false } =>
        // abbrev(cidr) ≠ abbrev(inet): inet_cidr_ntop truncated-octet
        // form with the masklen always shown (network.out `10.1/16`) —
        // the struct can't carry the cidr-ness, so dispatch syntactically
        graft.functions.NetworkFns.abbrevCidr(a(0))
      case "set_masklen" if args.headOption.exists {
          case FnCall("tocidr", _, _) => true; case _ => false } =>
        // set_masklen(cidr, n) TRUNCATES to the new network (inet.c
        // cidr_set_masklen zeroes host bits — network.out 192.168.1.0/24)
        graft.functions.NetworkFns.network(
          graft.functions.NetworkFns.setMasklen(a(0), a(1)))
      case "trunc" if args.length == 1 =>
        // PG overloads trunc(): macaddr/macaddr8 zero their NIC bytes
        // (mac.c/mac8.c), numerics truncate toward zero — macaddr longs are
        // schema-indistinguishable from ints, so dispatch syntactically on
        // the argument being a macaddr constructor/cast
        args.head match {
          case FnCall("tomacaddr", _, _) =>
            graft.functions.NetworkFns.macaddrTrunc(a(0))
          case FnCall("tomacaddr8", _, _) =>
            graft.functions.NetworkFns.macaddr8Trunc(a(0))
          case _ => dataTypeOpt(a(0), ctx) match {
            case Some(DoubleType | FloatType) =>
              when(a(0) >= 0, floor(a(0))).otherwise(ceil(a(0))).cast("double")
            case Some(_: DecimalType) =>
              when(a(0) >= 0, floor(a(0))).otherwise(ceil(a(0)))
            case _ => a(0) // integral trunc is identity
          }
        }
      case "topoint" => // 2-arg constructor, or 1-arg '(x,y)' string cast
        if (args.length == 2) graft.functions.RangeGeoFns.point(a(0), a(1))
        else if (geoKindIs(a(0), "point", ctx)) a(0)
        else graft.functions.RangeGeoFns.toPoint(a(0))
      case "tobox" =>
        if (geoKindIs(a(0), "box", ctx)) a(0)
        else graft.functions.RangeGeoFns.toBox(a(0))
      case "tographid" =>
        // graphid is the packed 64-bit entity id (graphid.h) — a BIGINT
        a(0).cast("long")
      // a CONSTANT PG-builtin geometric value cast to geometry converts
      // to the PostGIS domain and prints hex EWKB (postgis.out:3597-3615)
      case "togeometry" if Compiler.pgGeoCastConst(
        FnCall(name, args, distinct = false)).isDefined =>
        geomLit(Compiler.pgGeoCastConst(FnCall(name, args, distinct = false)).get)
      case "togeometry" => dataTypeOpt(a(0), ctx) match {
        // a PG geometric value (point/path/polygon/…) recasts to
        // geometry as itself — the struct IS our geometry carrier
        case Some(t: StructType) => a(0)
        case Some(ArrayType(_, _)) => a(0)
        case _ =>
          // '::geometry' of a WKT 'POINT(x y)' string renders as a PG
          // point (geometric.sql:41); richer WKT folds via geomConst
          val numP = "(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"
          val pat = s"(?i)POINT\\s*\\(\\s*$numP\\s+$numP\\s*\\)"
          graft.functions.RangeGeoFns.point(
            regexp_extract(a(0), pat, 1).cast("double"),
            regexp_extract(a(0), pat, 2).cast("double"))
      }
      case "tointrange" => graft.functions.RangeGeoFns.toRange(a(0), numeric = false)
      case "tonumrange" => graft.functions.RangeGeoFns.toRange(a(0), numeric = true)
      case "tointerval" => graft.functions.TemporalFns.toInterval(a(0))
      case "totime" => dataTypeOpt(a(0), ctx) match {
        case Some(TimestampType) | Some(TimestampNTZType) => // time part of a timestamp
          // NTZ wall-clock reinterprets as UTC instant (session zone is
          // UTC) — unix_micros/date_trunc only accept TimestampType
          val t = a(0).cast("timestamp")
          unix_micros(t) - unix_micros(date_trunc("day", t))
        case Some(t) if isIntervalStruct(t) => // interval's time-of-day part
          pmod(a(0).getField("us"), lit(86400000000L))
        case Some(t) if isTimetzStruct(t) => a(0).getField("us")
        case _ => graft.functions.TemporalFns.toTime(a(0))
      }
      // timetz is a DISTINCT value (PG TimeTzADT): wall clock + written
      // zone offset, struct(us, off)
      case "totimetz" => dataTypeOpt(a(0), ctx) match {
        case Some(TimestampType) | Some(TimestampNTZType) =>
          graft.functions.TemporalFns.timetz(
            unix_micros(a(0)) - unix_micros(date_trunc("day", a(0))), lit(0))
        case Some(t) if isIntervalStruct(t) =>
          graft.functions.TemporalFns.timetz(
            pmod(a(0).getField("us"), lit(86400000000L)), lit(0))
        case Some(t) if isTimetzStruct(t) => a(0)
        // a plain TIME (long micros-of-day, e.g. `'…'::time`) keeps its
        // wall clock at the session zone (PG time_timetz; temporal.out
        // toTimeTz('07:37:16.00+00'::time) → 07:37:16+00, not 00:00:00)
        case Some(LongType) if args.headOption.exists(e => isTimeExpr(e, ctx)) =>
          graft.functions.TemporalFns.timetz(a(0), lit(0))
        case _ => graft.functions.TemporalFns.toTimeTz(a(0))
      }
      case "_bitnot" => dataTypeOpt(a(0), ctx) match {
        // prefix `~`: inet → family-width complement; integers → bitwise NOT
        case Some(t) if isInetStruct(t) => graft.functions.NetworkFns.inetNot(a(0))
        case _ => bitwise_not(a(0).cast("long"))
      }
      // SQL niladic datetime pseudo-functions + the PG now() family (PG
      // gram.y func_expr_common_subexpr; old/regress/temporal.sql:600-660).
      // Precision arguments are accepted and ignored (PG rounds fractional
      // seconds; sub-second parity is unobservable for a volatile value).
      case "current_timestamp" | "now" | "transaction_timestamp" |
           "statement_timestamp" | "clock_timestamp" =>
        current_timestamp()
      case "localtimestamp" => current_timestamp().cast("timestamp_ntz")
      case "current_date"   => current_date()
      case "current_time" =>
        graft.functions.TemporalFns.timetz(
          unix_micros(current_timestamp()) -
            unix_micros(date_trunc("day", current_timestamp())), lit(0))
      case "localtime" =>
        unix_micros(current_timestamp()) -
          unix_micros(date_trunc("day", current_timestamp()))
      case "timeofday" =>
        // PG 'Thu Aug 14 02:00:00.000000 2026 UTC' (Spark bans EEE — day
        // name via dayofweek lookup)
        concat(
          element_at(
            array(Seq("Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat").map(lit): _*),
            dayofweek(current_timestamp())),
          date_format(current_timestamp(), " MMM d HH:mm:ss.SSSSSS yyyy "),
          lit("UTC"))
      case "totsquery"  => args.head match {
        // literal tsquery_in canonicalization handles quoted phrases and
        // the full operator grammar; column inputs keep the regex path
        case Lit(GString(s)) =>
          lit(graft.functions.TsearchFns.canonTsquery(s))
        case _ => graft.functions.TsearchFns.toTsquery(a(0))
      }
      case "plainto_tsquery" | "phraseto_tsquery" | "websearch_to_tsquery" =>
        args.head match {
          case Lit(GString(s)) => lit(name match {
            case "plainto_tsquery"   => graft.functions.TsearchFns.plaintoTsquery(s)
            case "phraseto_tsquery"  => graft.functions.TsearchFns.phrasetoTsquery(s)
            case _                   => graft.functions.TsearchFns.websearchTsquery(s)
          })
          case _ => throw new UnsupportedOperationException(
            s"$name requires a literal argument (stemming runs driver-side)")
        }
      case "_tsquery_not" => litTsqueryStr(args.head) match {
        case Some(q) => lit(graft.functions.TsearchFns.notTsq(q))
        case None => graft.functions.TsearchFns.tsqueryNot(a(0))
      }
      // tsquery_phrase(q1, q2[, dist]) — succeeds here where the reference
      // ereports "unrecognized node type" (its own bug, tsearch.out:527)
      case "tsquery_phrase" =>
        litTsqueryStr(FnCall("tsquery_phrase", args, distinct = false)) match {
          case Some(q) => lit(q)
          case None => throw new UnsupportedOperationException(
            "tsquery_phrase requires literal tsquery arguments")
        }
      case "intrange" | "numrange" =>
        // numrange bounds are CONTINUOUS (PG numeric — no discrete
        // canonicalization): store double so the range's element type
        // distinguishes it from intrange for cmp/render
        def nb(i: Int): Column =
          if (name == "numrange") a(i).cast("double") else a(i)
        graft.functions.RangeGeoFns.range(nb(0), nb(1),
          if (args.length == 3) litString(args(2)) else "[)")
      // temporal ranges + the five multirange types (gtype_range.c,
      // GT_HEADER_RANGE_*_MULTI)
      case "tsrange" | "tstzrange" =>
        // string bounds go through the PG-flexible parser (MDY, AM/PM —
        // old/regress/range.sql:140-200 '1/1/2000 4:00:00 PM')
        def tsArg(i: Int): Column = dataTypeOpt(a(i), ctx) match {
          case Some(StringType) =>
            graft.functions.TemporalFns.pgTimestampParse(a(i), tz = name == "tstzrange")
          case _ => a(i)
        }
        graft.functions.RangeGeoFns.tsRange(tsArg(0), tsArg(1),
          if (args.length == 3) litString(args(2)) else "[)",
          tz = name == "tstzrange")
      case "daterange" =>
        def dArg(i: Int): Column = dataTypeOpt(a(i), ctx) match {
          case Some(StringType) =>
            graft.functions.TemporalFns.pgTimestampParse(a(i), tz = false).cast("date")
          case _ => a(i)
        }
        graft.functions.RangeGeoFns.dateRange(dArg(0), dArg(1),
          if (args.length == 3) litString(args(2)) else "[)")
      case "intmultirange" | "int4multirange" | "int8multirange" |
           "nummultirange" | "tsmultirange" | "tstzmultirange" |
           "datemultirange" =>
        graft.functions.RangeGeoFns.multirange(args.indices.map(a))
      case "totsrange" | "totstzrange" =>
        graft.functions.RangeGeoFns.toRangeTemporal(a(0), isDate = false,
          tz = name == "totstzrange")
      case "todaterange" =>
        graft.functions.RangeGeoFns.toRangeTemporal(a(0), isDate = true)
      case "tointmultirange" =>
        graft.functions.RangeGeoFns.toMultirange(a(0), numeric = false)
      case "tonummultirange" =>
        graft.functions.RangeGeoFns.toMultirange(a(0), numeric = true)
      case "totsmultirange" | "totstzmultirange" =>
        graft.functions.RangeGeoFns.toMultirangeTemporal(a(0), isDate = false,
          tz = name == "totstzmultirange")
      case "todatemultirange" =>
        graft.functions.RangeGeoFns.toMultirangeTemporal(a(0), isDate = true)
      case "range_merge" | "multirange_isempty" if args.length == 1 =>
        if (name == "multirange_isempty") size(a(0)) === 0
        else { // bounding range of a multirange (PG range_merge)
          val first = element_at(a(0), 1); val last = element_at(a(0), -1)
          struct(first.getField("lo").as("lo"), last.getField("hi").as("hi"),
            first.getField("lo_inc").as("lo_inc"), last.getField("hi_inc").as("hi_inc"))
        }
      // PG geometric values + named operator bodies (gtype_geometric.c,
      // postgraph-geometric.sql.in); `gk` is the plan-time type tag
      case "st_xmin" | "st_ymin" | "st_zmin" | "st_xmax" | "st_ymax" | "st_zmax" =>
        // columnar form over a BOX/BOX3D render string (a WITH-bound
        // ::box3d value): numbers of the parenthesized body, positional
        val nums = transform(
          regexp_extract_all(substring_index(a(0).cast("string"), "(", -1),
            lit("-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"), lit(0)),
          t => t.cast("double"))
        val is3d = size(nums) === 6
        name match {
          case "st_xmin" => element_at(nums, 1)
          case "st_ymin" => element_at(nums, 2)
          case "st_zmin" => when(is3d, element_at(nums, 3)).otherwise(lit(0.0))
          case "st_xmax" => when(is3d, element_at(nums, 4)).otherwise(element_at(nums, 3))
          case "st_ymax" => when(is3d, element_at(nums, 5)).otherwise(element_at(nums, 4))
          case _         => when(is3d, element_at(nums, 6)).otherwise(lit(0.0))
        }
      case "st_asewkt" | "st_astext" if args.length == 1 =>
        // columnar single-arg form: EWKT strings pass through; a point4
        // struct renders as POINT(x y)
        dataTypeOpt(a(0), ctx) match {
          case Some(StringType) => a(0)
          case Some(s: StructType) if s.fieldNames.sameElements(Array("x", "y", "z", "m")) =>
            concat(lit("POINT("), a(0).getField("x").cast("string"), lit(" "),
              a(0).getField("y").cast("string"), lit(")"))
          case _ => throw new UnsupportedOperationException(
            s"$name over a non-constant non-string geometry")
        }
      case "tolseg" =>
        if (geoKindIs(a(0), "lseg", ctx)) a(0)
        else graft.functions.PgGeoFns.toLseg(a(0))
      case "toline" =>
        if (geoKindIs(a(0), "line", ctx)) a(0)
        else graft.functions.PgGeoFns.toLine(a(0))
      case "topath" =>
        if (geoKindIs(a(0), "path", ctx)) a(0)
        else graft.functions.PgGeoFns.toPath(a(0))
      case "topolygon" =>
        if (geoKindIs(a(0), "polygon", ctx)) a(0)
        else graft.functions.PgGeoFns.toPolygon(a(0))
      case "tocircle" =>
        if (geoKindIs(a(0), "circle", ctx)) a(0)
        else graft.functions.PgGeoFns.toCircle(a(0))
      case "lseg"      => graft.functions.PgGeoFns.lseg(a(0), a(1))
      case "line" if args.length == 3 =>
        graft.functions.PgGeoFns.line(a(0), a(1), a(2))
      case "line"      => graft.functions.PgGeoFns.lineFromPoints(a(0), a(1))
      case "circle"    => graft.functions.PgGeoFns.circle(a(0), a(1))
      case "_geo_vertical"   => graft.functions.PgGeoFns.vertical(a(0), geoKindOf(a(0), ctx))
      case "_geo_horizontal" => graft.functions.PgGeoFns.horizontal(a(0), geoKindOf(a(0), ctx))
      case "center"          => graft.functions.PgGeoFns.center(a(0), geoKindOf(a(0), ctx))
      case "_geo_length"     => args.head match {
        // `@-@ ve` / `@-@ p` = traversal length in edges (postgraph-
        // variable_edge.sql.in:242, traversal.sql.in:192) — the operator
        // shares its spelling with geometric path length
        case Var(v) if isVleVar(v, ctx) => size(col(s"${v}__ids"))
        case Var(v) if ctx.vars.get(v).exists(_.kind == VarKind.Path) =>
          compileFn("length", args, ctx)
        case _ => graft.functions.PgGeoFns.geoLength(a(0), geoKindOf(a(0), ctx))
      }
      case "height" => graft.functions.RangeGeoFns.boxHeight(
        graft.functions.PgGeoFns.boundBox(a(0), geoKindOf(a(0), ctx)))
      case "width" => graft.functions.RangeGeoFns.boxWidth(
        graft.functions.PgGeoFns.boundBox(a(0), geoKindOf(a(0), ctx)))
      case "bound_box" =>
        val b1 = graft.functions.PgGeoFns.boundBox(a(0), geoKindOf(a(0), ctx))
        val b2 = graft.functions.PgGeoFns.boundBox(a(1), geoKindOf(a(1), ctx))
        struct(least(b1.getField("x1"), b2.getField("x1")).as("x1"),
          least(b1.getField("y1"), b2.getField("y1")).as("y1"),
          greatest(b1.getField("x2"), b2.getField("x2")).as("x2"),
          greatest(b1.getField("y2"), b2.getField("y2")).as("y2"))
      // graph utility fns (sql/postgraph.sql.in:481-486, gtype graphid ops)
      case "_graphid" => shiftleft(a(0).cast("long"), 48).bitwiseOR(a(1).cast("long"))
      case "_extract_label_id" => shiftrightunsigned(a(0).cast("long"), 48).cast("int")
      case "_extract_entry_id" =>
        a(0).cast("long").bitwiseAND(lit(graft.graph.PropertyGraph.EntryIdMask))
      case "_label_name" =>
        // small label catalog → case/when chain resolved at plan time
        val lid = shiftrightunsigned(a(0).cast("long"), 48).cast("int")
        graph.labelIds.foldLeft(lit(null).cast("string"))((acc, kv) =>
          when(lid === lit(kv._2), lit(kv._1)).otherwise(acc))
      case "age_properties" => compileFn("properties", args, ctx)
      case "throw_error" => raise_error(a(0).cast("string"))
      case "md5"    => md5(a(0).cast("string"))
      case "sha224" => sha2(a(0).cast("string"), 224)
      case "sha256" => sha2(a(0).cast("string"), 256)
      case "sha384" => sha2(a(0).cast("string"), 384)
      case "sha512" => sha2(a(0).cast("string"), 512)
      case "tobytea" => args.head match {
        // PG bytea input (varlena.c byteain): \x-prefixed hex, or the
        // escape format with \OOO octal bytes; rendered back in PG hex
        // form. Literal-only — bytea columns have no regress surface.
        case Lit(GString(s0)) =>
          val s = s0.stripPrefix("\"").stripSuffix("\"")
          val bytes: Array[Byte] =
            if (s.startsWith("\\x") || s.startsWith("x"))
              s.stripPrefix("\\").stripPrefix("x")
                .grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
            else {
              val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
              var i = 0
              while (i < s.length) {
                if (s.charAt(i) == '\\' && i + 3 < s.length &&
                    s.substring(i + 1, i + 4).forall(c => c >= '0' && c <= '7')) {
                  out += Integer.parseInt(s.substring(i + 1, i + 4), 8).toByte
                  i += 4
                } else if (s.charAt(i) == '\\' && i + 1 < s.length &&
                    s.charAt(i + 1) == '\\') {
                  out += '\\'.toByte; i += 2
                } else { out += s.charAt(i).toByte; i += 1 }
              }
              out.toArray
            }
          lit("\\x" + bytes.map("%02x".format(_)).mkString)
        case other => throw new UnsupportedOperationException(
          s"tobytea needs a string literal, got $other")
      }
      // traversal accessors (reference: traversal.c nodes/relationships):
      // the path value is (id, label) element structs — uniform across
      // labels so the array type unifies; full property structs land with
      // the GValue column codec
      case "nodes" => args.head match {
        case Var(v) if isVleVar(v, ctx) =>
          // nodes(variable_edge): the n−1 vertices BETWEEN the edges, not
          // the endpoints (variable_edge.c:314-334 — odd children only)
          val ns = col(s"${v}__nodes")
          slice(ns, lit(2), greatest(size(ns) - 2, lit(0)))
        case other => pathMembers(other, ctx, edges = false)
      }
      case "relationships" | "edges" => args.head match {
        case Var(v) if isVleVar(v, ctx) => col(s"${v}__edges")
        case other => pathMembers(other, ctx, edges = true)
      }
      case other =>
        // Fallback: resolve through the session function registry. The
        // reference registers its whole 496-function catalog for SQL use;
        // our Registry mirrors ~90 names (st_*, inet/macaddr, tsearch,
        // vector, text pipeline) — this makes every one of them, plus any
        // Spark builtin, callable from Cypher. Unknown names surface as an
        // analysis error naming the function.
        graft.functions.Registry.register(spark)
        val cs = args.map(sub)
        // the two-column stat aggregates (corr/covar/regr_*) reach Spark's
        // builtins directly — decode dynamic property inputs to numeric
        val cs2 =
          if (TwoColStatAggs(other))
            cs.map { c => dataTypeOpt(c, ctx) match {
              case Some(t) if graft.gvalue.GValueCol.isGValue(t) =>
                graft.gvalue.GValueCol.numeric(c)
              case _ => c
            }}
          else cs
        // the reference's regr_r2 AGGREGATE registers gtype_regr_avgy as
        // its finalfunc (postgraph-aggregation.sql.in:533-541 copy-paste),
        // so regr_r2(y, x) actually returns avg(y) — old aggregation.out
        // regr_r2(u.gpa, u.age) = 3.49285714285714 = mean gpa
        val fn = if (other == "regr_r2") "regr_avgy" else other
        call_function(fn, cs2: _*)
    }
  }

  // ---------------------------------------------------- VLE traversal values

  /** (id → full entity struct) lookup relation over every label table —
    * vertices: (id, label, properties); edges add (start_id, end_id). The
    * properties map is GValue-encoded so the struct unifies across labels
    * with different property schemas (reference: traversal.c:64-120 /
    * variable_edge.c:62 materialize the same full-entity varlenas).
    */
  private def entityStructTable(isEdge: Boolean): DataFrame = {
    import graft.gvalue.GValueCol
    // union of PER-LABEL projections, not the null-padded union view: each
    // entity's map holds only its own label's columns (absent property =
    // absent key, reference semantics) — the union view would encode every
    // label's column set for every row (40 keys/vertex on the TPC-H graph,
    // the r4 78-second g21 regression)
    val meta = Set("id", "start_id", "end_id", "__label", "label")
    val tables = if (isEdge) graph.edgeLabels else graph.vertexLabels
    val parts = tables.toSeq.sortBy(_._1).map { case (label, base) =>
      val props = base.columns.filterNot(meta).toSeq.sorted
      val pmap =
        if (props.isEmpty)
          map_from_arrays(array().cast(ArrayType(StringType)),
            array().cast(ArrayType(GValueCol.structType)))
        else map(props.flatMap { k =>
          val dt = base.schema(k).dataType
          val enc = if (GValueCol.canEncode(dt)) GValueCol.encode(col(k), dt)
                    else GValueCol.encode(col(k).cast("string"), StringType)
          Seq(lit(PropNames.unesc(k)), enc)
        }: _*)
      val fields =
        if (isEdge) Seq(col("id").as("id"), col("start_id").as("start_id"),
          col("end_id").as("end_id"), lit(label).as("label"), pmap.as("properties"))
        else Seq(col("id").as("id"), lit(label).as("label"), pmap.as("properties"))
      base.select(col("id").as("__lk_id"), struct(fields: _*).as("__ent"))
    }
    parts.reduce(_.unionByName(_))
  }

  /** Turn an accumulated id array into an array of full entity structs in
    * hop order: posexplode → hash join against the label tables → re-collect
    * sorted by position, joined back on the (pre-frozen) row id. Runs once
    * per query and only when a projection or predicate actually references
    * the traversal's VALUES — the hop joins themselves only ever shuffle
    * bare id arrays.
    */
  private def joinStructs(df: DataFrame, paths: DataFrame, keys: Seq[String],
      idsCol: String, out: String, isEdge: Boolean): DataFrame = {
    val lookup = entityStructTable(isEdge)
    val entType = lookup.schema("__ent").dataType
    val exploded = paths.select(keys.map(col) :+
      posexplode(col(idsCol)).as(Seq("__pos", "__mid")): _*)
    val joined = exploded.join(lookup, col("__mid") === col("__lk_id"))
    // collect_list runs as ObjectHashAggregate — NO sort. The alternatives
    // all smuggle a sort in: first(struct-slot) aggregates fall back to
    // SortAggregate (struct buffers aren't hash-agg mutable), and a
    // frame-complete window collect_list is sort-based by definition —
    // both measured 2-4× slower at sf0.1. The per-group reorder comparator
    // is interpreted, but arrays are hop-count sized (≤ VleMaxHops+1), so
    // it touches a handful of elements per path.
    val collected = joined.groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("__pos").as("p"), col("__ent").as("e"))).as("__pe"))
      .select(keys.map(col) :+ transform(
        array_sort(col("__pe"), (l, r) =>
          when(l.getField("p") < r.getField("p"), -1)
            .when(l.getField("p") > r.getField("p"), 1).otherwise(0)),
        x => x.getField("e")).as(out): _*)
    // left join + empty-array fill: a zero-hop path (lo=0) has no edges
    df.join(collected, keys, "left_outer")
      .withColumn(out, coalesce(col(out), array().cast(ArrayType(entType))))
  }

  /** Ensure `${v}__edges` / `${v}__nodes` struct arrays exist for VLE var v.
    *
    * The join key is the PATH CONTENT itself — the (edge-ids, node-ids)
    * array pair, which uniquely identifies a traversal (zero-hop paths have
    * empty edge arrays but distinct node arrays). Keying on content instead
    * of a frozen row id means the WIDE binding relation is never
    * checkpointed, so Catalyst's column pruning stays live across the
    * materialization joins — freezing the 50-column relation was the r4
    * 50-second g21 cost, not the lookups. Only the narrow distinct-path
    * relation (two array columns) materializes, once, for both lookups.
    */
  private def materializeVle(ctx0: Ctx, v: String, needNodes: Boolean,
      needEdges: Boolean): Ctx = {
    val needE = needEdges && !ctx0.df.columns.contains(s"${v}__edges")
    val needN = needNodes && !ctx0.df.columns.contains(s"${v}__nodes")
    if (!needE && !needN) return ctx0
    val keys = Seq(s"${v}__ids", s"${v}__nids")
    // 64-bit content key → every materialization join is a LONG hash join
    // (joining on the arrays themselves forces sort-merge with per-row
    // array comparisons — measured 1.5× slower than even the frozen-rid
    // checkpoint). Collision odds over ~10⁶ distinct paths ≈ 3e-8.
    val key = s"__vmat_${v}_key"
    def keyed(df: DataFrame) = df.withColumn(key, xxhash64(keys.map(col): _*))
    val paths = keyed(ctx0.df.select(keys.map(col): _*).dropDuplicates(keys))
      .localCheckpoint() // narrow: shared by the edge and node lookups
    var df = keyed(ctx0.df)
    if (needE) df = joinStructs(df, paths, Seq(key), s"${v}__ids", s"${v}__edges", isEdge = true)
    if (needN) df = joinStructs(df, paths, Seq(key), s"${v}__nids", s"${v}__nodes", isEdge = false)
    ctx0.copy(df = df.drop(key))
  }

  /** VLE variables whose full traversal values the expression needs:
    * `(var, "edges"|"nodes")` pairs. size()/length() work on the bare id
    * arrays and are skipped.
    */
  private def vleValueNeeds(e: Expr, ctx: Ctx): Set[(String, String)] = {
    def vleOf(p: String): Seq[String] = ctx.vars.get(p) match {
      case Some(info) if info.kind == VarKind.Path =>
        info.pathEdges.filter(m => ctx.vars.get(m).exists(_.kind == VarKind.VlePath))
      case _ => Nil
    }
    e match {
      case Var(n) if ctx.vars.get(n).exists(_.kind == VarKind.VlePath) =>
        // the VariableEdge VALUE interleaves interior vertices (see the
        // Var projection) — both sequences materialize
        Set((n, "nodes"), (n, "edges"))
      case Var(p) if ctx.vars.get(p).exists(_.kind == VarKind.Path) =>
        // bare path value needs both sequences of every VLE segment
        vleOf(p).flatMap(m => Seq((m, "nodes"), (m, "edges"))).toSet
      case FnCall("size" | "length", List(Var(_)), _) => Set.empty
      // indexed access with a literal index over a single-VLE-segment path
      // prunes to ONE entity lookup join — no explode/collect of the whole
      // traversal (the dominant cost when a query touches only the path's
      // endpoints, the overwhelmingly common shape). When the access is a
      // direct id/label FIELD of the element, the need carries the field
      // ("kind@i#field") and even the lookup join is skipped.
      case Prop(Index(FnCall("nodes", List(Var(p)), _), LitInt(i)), fld)
          if singleVleOf(p, ctx).isDefined =>
        Set((singleVleOf(p, ctx).get, s"nodes@$i#$fld"))
      case Prop(Index(FnCall("relationships" | "edges", List(Var(p)), _),
          LitInt(i)), fld) if singleVleOf(p, ctx).isDefined =>
        Set((singleVleOf(p, ctx).get, s"edges@$i#$fld"))
      case Index(FnCall("nodes", List(Var(p)), _), LitInt(i))
          if singleVleOf(p, ctx).isDefined =>
        Set((singleVleOf(p, ctx).get, s"nodes@$i"))
      case Index(FnCall("relationships" | "edges", List(Var(p)), _),
          LitInt(i)) if singleVleOf(p, ctx).isDefined =>
        Set((singleVleOf(p, ctx).get, s"edges@$i"))
      case FnCall("nodes", List(Var(p)), _) =>
        if (ctx.vars.get(p).exists(_.kind == VarKind.VlePath)) Set((p, "nodes"))
        else vleOf(p).map((_, "nodes")).toSet
      case FnCall("relationships" | "edges", List(Var(p)), _) =>
        if (ctx.vars.get(p).exists(_.kind == VarKind.VlePath)) Set((p, "edges"))
        else vleOf(p).map((_, "edges")).toSet
      case FnCall(_, args, _) => args.flatMap(vleValueNeeds(_, ctx)).toSet
      // `a !!= b` (match_vles) touches only edge endpoints — skip the node
      // materialization the bare-Var case would force
      case Bin("!!=", Var(a), Var(b))
          if ctx.vars.get(a).exists(_.kind == VarKind.VlePath) &&
             ctx.vars.get(b).exists(_.kind == VarKind.VlePath) =>
        Set((a, "edges"), (b, "edges"))
      case Bin(_, l, r) => vleValueNeeds(l, ctx) ++ vleValueNeeds(r, ctx)
      case Un(_, x) => vleValueNeeds(x, ctx)
      case IsNull(x, _) => vleValueNeeds(x, ctx)
      case Index(b, i) => vleValueNeeds(b, ctx) ++ vleValueNeeds(i, ctx)
      case Slice(b, l, h) => vleValueNeeds(b, ctx) ++
        (l.toList ++ h.toList).flatMap(vleValueNeeds(_, ctx))
      case CaseExpr(op, whens, o) =>
        (op.toList ++ whens.flatMap(w => List(w._1, w._2)) ++ o.toList)
          .flatMap(vleValueNeeds(_, ctx)).toSet
      case ListLit(items) => items.flatMap(vleValueNeeds(_, ctx)).toSet
      case MapLit(es) => es.flatMap(kv => vleValueNeeds(kv._2, ctx)).toSet
      case StringOp(_, l, r) => vleValueNeeds(l, ctx) ++ vleValueNeeds(r, ctx)
      case Prop(b, _) => vleValueNeeds(b, ctx)
      case ListComp(_, src, w, pj) =>
        (Seq(src) ++ w.toList ++ pj.toList).flatMap(vleValueNeeds(_, ctx)).toSet
      case _ => Set.empty
    }
  }

  /** Literal integer index, folding the parser's unary-minus shape
    * (`[-1]` arrives as Un("NEG", Lit(1))).
    */
  private object LitInt {
    def unapply(e: Expr): Option[Long] = e match {
      case Lit(graft.gvalue.GInt(i)) => Some(i)
      case Un("NEG", Lit(graft.gvalue.GInt(i))) => Some(-i)
      case _ => None
    }
  }

  private def isVleVar(n: String, ctx: Ctx): Boolean =
    ctx.vars.get(n).exists(_.kind == VarKind.VlePath)

  /** `v.prop <-> <const numeric vector>` (either side) — the ANN sort-key
    * shape the IVFFlat probe rewrite recognizes. `<->` = l2, `<#>` = ip.
    */
  private object IvfDistShape {
    private def num(g: GValue): Option[Double] = g match {
      case GInt(i) => Some(i.toDouble)
      case GFloat(f) => Some(f)
      case GNumeric(n) => Some(n.toDouble)
      case _ => None
    }
    private def vecOf(x: Expr): Option[Seq[Double]] = {
      val items: Option[Seq[GValue]] = x match {
        case ListLit(es) =>
          val gs = es.map(Compiler.litGValue)
          if (gs.forall(_.isDefined)) Some(gs.map(_.get)) else None
        case other => Compiler.litGValue(other).collect { case GArray(xs) => xs }
      }
      items.filter(_.nonEmpty).flatMap { xs =>
        val ds = xs.map(num)
        if (ds.forall(_.isDefined)) Some(ds.map(_.get)) else None
      }
    }
    def unapply(e: Expr): Option[(String, String, String, Seq[Double])] = {
      val metric = Map("<->" -> "l2", "<#>" -> "ip")
      e match {
        case Bin(op @ ("<->" | "<#>"), Prop(Var(v), p), r) =>
          vecOf(r).map(vs => (v, p, metric(op), vs))
        case Bin(op @ ("<->" | "<#>"), l, Prop(Var(v), p)) =>
          vecOf(l).map(vs => (v, p, metric(op), vs))
        case _ => None
      }
    }
  }

  /** Orderable surrogate for a path value: the interleaved
    * (v0, e0, v1, e1, …) graphid sequence — exactly what the reference's
    * traversal_btree_cmp compares (traversal.c:188-215). Lexicographic
    * array<long> comparison (incl. the shorter-prefix tiebreak) matches.
    */
  private def pathOrderKey(p: String, ctx: Ctx): Column = {
    val info = ctx.vars(p)
    val head = array(col(s"${info.pathNodes.head}__id"))
    val segs = info.pathEdges.zipWithIndex.map { case (m, i) =>
      if (isVleVar(m, ctx)) {
        val ids = col(s"${m}__ids"); val nids = col(s"${m}__nids")
        flatten(zip_with(ids, slice(nids, lit(2), greatest(size(nids) - 1, lit(0))),
          (e, v) => array(e, v)))
      } else array(col(s"${m}__id"), col(s"${info.pathNodes(i + 1)}__id"))
    }
    concat(head +: segs: _*)
  }

  /** date_part/extract with PG's full field vocabulary (datetime.c /
    * timestamp.c extract): the fields Spark's date_part lacks are computed
    * arithmetically, and interval / time-of-day operands extract from the
    * struct / micros encoding directly.
    */
  private def pgDatePart(field0: String, src: Column, ctx: Ctx): Column = {
    val field = field0.toLowerCase
    dataTypeOpt(src, ctx) match {
      case Some(t) if isIntervalStruct(t) =>
        val us = src.getField("us")
        field match {
          case "year"    => (src.getField("months") / 12).cast("long").cast("double")
          case "month"   => (src.getField("months") % 12).cast("double")
          case "day"     => src.getField("days").cast("double")
          case "hour"    => (us / 3600000000L).cast("long").cast("double")
          case "minute"  => ((us % 3600000000L) / 60000000L).cast("long").cast("double")
          case "second"  => (us % 60000000L).cast("double") / 1e6
          case "epoch"   =>
            src.getField("months").cast("double") * 2592000.0 +
              src.getField("days").cast("double") * 86400.0 + us.cast("double") / 1e6
          case other => throw new UnsupportedOperationException(
            s"date_part('$other', interval)")
        }
      case Some(LongType) => // time-of-day micros
        field match {
          case "hour"   => (src / 3600000000L).cast("long").cast("double")
          case "minute" => ((src % 3600000000L) / 60000000L).cast("long").cast("double")
          case "second" => (src % 60000000L).cast("double") / 1e6
          case "epoch"  => src.cast("double") / 1e6
          case "timezone" => lit(0.0) // session zone is UTC
          case other => throw new UnsupportedOperationException(
            s"date_part('$other', time)")
        }
      case Some(t) if isTimetzStruct(t) => // wall clock + written offset
        val us = src.getField("us"); val off = src.getField("off")
        field match {
          case "hour"   => (us / 3600000000L).cast("long").cast("double")
          case "minute" => ((us % 3600000000L) / 60000000L).cast("long").cast("double")
          case "second" => (us % 60000000L).cast("double") / 1e6
          case "epoch"  => (us.cast("double") - off.cast("double") * 1e6) / 1e6
          case "timezone" => off.cast("double")
          case "timezone_hour" => (off / 3600).cast("long").cast("double")
          case "timezone_minute" => ((off % 3600) / 60).cast("long").cast("double")
          case other => throw new UnsupportedOperationException(
            s"date_part('$other', timetz)")
        }
      case _ => field match {
        case "isoyear" => date_part(lit("YEAROFWEEK"), src).cast("double")
        case "isodow"  => date_part(lit("DAYOFWEEK_ISO"), src).cast("double")
        case "epoch"   => unix_micros(src.cast("timestamp")).cast("double") / 1e6
        case "decade"  => floor(year(src).cast("double") / 10)
        case "century" => ceil(year(src).cast("double") / 100)
        case "millennium" => ceil(year(src).cast("double") / 1000)
        case "dow"     => // PG numbers Sunday 0..Saturday 6
          (dayofweek(src.cast("date")) - 1).cast("double")
        case "julian"  => // PG julian = date2j(date) + time-from-MIDNIGHT
          // fraction (timestamp.c) — 1970-01-01 is JDN 2440588, NOT the
          // noon-shifted 2440587.5 astronomical origin
          unix_micros(src.cast("timestamp")).cast("double") / 86400000000.0 + 2440588.0
        case "milliseconds" =>
          (unix_micros(src.cast("timestamp")) % 60000000L).cast("double") / 1e3
        case "microseconds" =>
          (unix_micros(src.cast("timestamp")) % 60000000L).cast("double")
        case "timezone" => lit(0.0) // session zone is UTC
        case _ => date_part(lit(field0), src)
      }
    }
  }

  /** PG-style datetime input parsing: ISO (plain cast) plus the
    * MM/DD/YYYY and day-name styles PG's datetime.c accepts and the
    * regress suite uses. Unparseable strings yield null (PG errors; a
    * total function is the documented dialect choice).
    */
  private def pgTimestampParse(c: Column, tz: Boolean = true): Column =
    graft.functions.TemporalFns.pgTimestampParse(c, tz)

  private def isTemporalType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  private def isIntegralType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Microseconds from the Unix epoch to PG's 2000-01-01 epoch. */
  private val PgEpochUs = 946684800000000L

  /** The interval struct(months, days, us) triple from TemporalFns. */
  private def isIntervalStruct(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.sameElements(Array("months", "days", "us"))
    case _ => false
  }

  /** The (lo, hi, lo_inc, hi_inc) range struct from RangeGeoFns. */
  private def isRangeStruct(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fieldNames.sameElements(Array("lo", "hi", "lo_inc", "hi_inc"))
    case _ => false
  }

  /** The timetz struct(us, off) pair from TemporalFns. */
  private def isTimetzStruct(dt: DataType): Boolean = dt match {
    case st: StructType => st.fieldNames.sameElements(Array("us", "off"))
    case _ => false
  }

  /** The inet struct(family, hi, lo, masklen) from NetworkFns. */
  private def isInetStruct(dt: DataType): Boolean = dt match {
    case st: StructType =>
      st.fieldNames.sameElements(Array("family", "hi", "lo", "masklen"))
    case _ => false
  }

  /** Times are micros-of-day LONGs — indistinguishable from ints by
    * schema, so time±interval dispatches on the RAW expr being a
    * time-producing cast/constructor.
    */
  private def isTimeExpr(e: Expr, ctx: Ctx): Boolean = e match {
    case FnCall("totime" | "make_time", _, _) => true
    case Bin("+" | "-", l, r) => isTimeExpr(l, ctx) || isTimeExpr(r, ctx)
    case Var(v) => ctx.df != null && ctx.df.schema.fields.exists(f =>
      f.name == v && f.metadata.contains(graft.gvalue.PgOut.TypeKey) &&
        f.metadata.getString(graft.gvalue.PgOut.TypeKey) == "time")
    case _ => false
  }

  /** Vector-producing raw exprs, for the `+` elementwise-vs-concat
    * dispatch (gtype_vector_add vs list concatenation).
    */
  private def isVectorExpr(e: Expr): Boolean = e match {
    case FnCall("tovector", _, _) => true
    case Bin("+" | "-" | "*", l, r) => isVectorExpr(l) || isVectorExpr(r)
    case _ => false
  }

  private def isVectorOperand(raw: Option[Expr], dt: ArrayType): Boolean =
    isNumericLike(dt.elementType) && raw.exists(isVectorExpr)

  /** The canonical tsquery string of a LITERAL-rooted tsquery expr, when
    * statically computable — combines re-parse + re-print driver-side so
    * the result parenthesizes correctly for its new root (tsqueryout).
    */
  private def litTsqueryStr(e: Expr): Option[String] = {
    import graft.functions.TsearchFns
    e match {
      case FnCall("totsquery", List(Lit(GString(s))), _) =>
        Some(TsearchFns.canonTsquery(s))
      case FnCall("plainto_tsquery", List(Lit(GString(s))), _) =>
        Some(TsearchFns.plaintoTsquery(s))
      case FnCall("phraseto_tsquery", List(Lit(GString(s))), _) =>
        Some(TsearchFns.phrasetoTsquery(s))
      case FnCall("websearch_to_tsquery", List(Lit(GString(s))), _) =>
        Some(TsearchFns.websearchTsquery(s))
      case FnCall("_tsquery_not", List(x), _) => litTsqueryStr(x).map(TsearchFns.notTsq)
      case FnCall("tsquery_phrase", a :: b :: rest, _) =>
        val d = rest match { case List(Lit(GInt(n))) => n.toInt; case _ => 1 }
        for { x <- litTsqueryStr(a); y <- litTsqueryStr(b) }
          yield TsearchFns.combineTsq(x, y, "<->", d)
      case Bin("&", l, r) =>
        for { x <- litTsqueryStr(l); y <- litTsqueryStr(r) }
          yield TsearchFns.combineTsq(x, y, "&")
      case Bin("||", l, r) =>
        for { x <- litTsqueryStr(l); y <- litTsqueryStr(r) }
          yield TsearchFns.combineTsq(x, y, "|")
      case Bin("<->", l, r) =>
        for { x <- litTsqueryStr(l); y <- litTsqueryStr(r) }
          yield TsearchFns.combineTsq(x, y, "<->")
      case _ => None
    }
  }

  /** The `graft.type` marker for a projected item, when its Spark type
    * underdetermines the gtype kind (PgOut.TypeKey semantics).
    */
  private def typeMarker(e: Expr, ctx: Ctx): Option[String] = e match {
    case _ if isTimeExpr(e, ctx) => Some("time")
    // `x::gtype` is the identity on the value — the inner kind's render
    // marker rides through (`'07:37:16'::time::gtype`, temporal.sql)
    case FnCall("togtype", List(inner), _) => typeMarker(inner, ctx)
    case FnCall("totsvector" | "ts_delete" | "strip" | "setweight", _, _) =>
      Some("tsvector")
    // render-parity markers (round 10, old-regress value replay): the
    // Spark type alone underdetermines these PG output forms
    case FnCall("tocidr", _, _) => Some("cidr")
    // a numeric LITERAL authored with exactly 18 fraction digits collides
    // with PgOut's DecimalType(38,18) storage-scale heuristic (scale 18 →
    // strip padding zeros); mark it value-authored so its trailing zeros
    // print scale-preserving like PG numeric_out (ADVICE r10)
    case Lit(GNumeric(d)) if d.scale == 18 => Some("numexact")
    case FnCall("tonumeric", List(Lit(GNumeric(d))), _) if d.scale == 18 =>
      Some("numexact")
    // network() returns CIDR (mask always printed — network.out
    // `network(192.168.1.5)` → 192.168.1.5/32); set_masklen over a cidr
    // stays cidr
    case FnCall("network", _, _) => Some("cidr")
    case FnCall("set_masklen", inner :: _, _) if (inner match {
      case FnCall("tocidr", _, _) => true; case _ => false }) => Some("cidr")
    // a CONSTANT geometry expression (::geometry cast, ST_MakePoint …)
    // projects as hex EWKB (postgis.out bare geometry form); its Z/M/SRID
    // flags live only in the driver-side ADT, so the exact render rides
    // the marker. A geometric-typed AS clause (`AS (c point)`) strips
    // this back to point_out (GraphSession). Scalar-returning st_* fns
    // are float8 — PG prints them without the gtype float's `.0`.
    case FnCall(n, _, _)
        if Compiler.geomConstFns(n.toLowerCase) &&
          geomConst(e).exists(_.isInstanceOf[GeomWkt.G]) =>
      Some("ewkb:" + GeomWkt.renderEwkbHex(
        geomConst(e).get.asInstanceOf[GeomWkt.G]))
    case _ if Compiler.pgGeoCastConst(e).isDefined =>
      Some("ewkb:" + GeomWkt.renderEwkbHex(Compiler.pgGeoCastConst(e).get))
    // spheroid/box values ride as their own out-format TEXT — never the
    // quoted gtype string render (postgis.out `SPHEROID("WGS 84",…)`)
    case FnCall("tospheroid" | "tobox2d" | "tobox3d", _, _) => Some("rawstr")
    case FnCall("tomacaddr" | "trunc_macaddr", _, _) => Some("macaddr")
    case FnCall("tomacaddr8" | "macaddr8_set7bit", _, _) => Some("macaddr8")
    // trunc(macaddr) keeps its type (mac.c macaddr_trunc — network.out
    // `trunc('12:34:56:78:90:ab'::macaddr)` → 12:34:56:00:00:00)
    case FnCall("trunc", List(inner), _)
        if typeMarker(inner, ctx).exists(m => m == "macaddr" || m == "macaddr8") =>
      typeMarker(inner, ctx)
    case FnCall("tobytea", _, _) => Some("bytea")
    case FnCall("sha224" | "sha256" | "sha384" | "sha512", _, _) => Some("byteahex")
    case Bin("||", l, r) =>
      (typeMarker(l, ctx) orElse typeMarker(r, ctx)).filter(_ == "tsvector")
    case Var(v) => ctx.df match {
      case null => None
      case df => df.schema.fields.find(_.name == v)
        .filter(_.metadata.contains(graft.gvalue.PgOut.TypeKey))
        .map(_.metadata.getString(graft.gvalue.PgOut.TypeKey))
    }
    case _ => None
  }

  /** Number text for string concatenation (float8out shortest): an
    * integral double in the plain window prints without `.0`.
    */
  private def numConcatText(c: Column, t: DataType): Column = t match {
    case DoubleType | FloatType =>
      when(c === floor(c) && abs(c) < 1e15, c.cast("long").cast("string"))
        .otherwise(c.cast("string"))
    case _ => c.cast("string")
  }

  /** PG time_pl_interval/time_mi_interval: shift by the span's us part,
    * wrap mod 24 h (months/days never move a time-of-day).
    */
  private def timeShift(time: Column, iv: Column, sign: Int): Column = {
    val day = lit(86400000000L)
    ((time + lit(sign) * iv.getField("us")) % day + day) % day
  }

  /** A path var bound to exactly `(a)-[vle*]->(b)` — its nodes()/
    * relationships() arrays are the VLE frontier's own nid/id sequences.
    */
  private def singleVleOf(p: String, ctx: Ctx): Option[String] =
    ctx.vars.get(p) match {
      case Some(info) if info.kind == VarKind.Path =>
        info.pathEdges match {
          case Seq(m) if ctx.vars.get(m).exists(_.kind == VarKind.VlePath) => Some(m)
          case _ => None
        }
      case _ => None
    }

  private def vleElemName(v: String, edges: Boolean, i: Long): String =
    s"${v}__elem_${if (edges) "edges" else "nodes"}_$i"

  /** One entity struct for position `i` of a VLE traversal: element_at on
    * the id array (negatives from the end, OOB → null) + one hash join
    * against the label tables. No explode, no per-path array rebuild.
    */
  private def materializeVleElem(ctx0: Ctx, v: String, edges: Boolean, i: Long,
      narrow: Boolean = false): Ctx = {
    val out = vleElemName(v, edges, i)
    var base = ctx0.df
    if (base.columns.contains(out)) {
      val hasProps = base.schema(out).dataType match {
        case st: StructType => st.fieldNames.contains("properties")
        case _ => false
      }
      // an existing full struct serves every access; an existing narrow
      // struct serves narrow access — otherwise rebuild full below
      if (hasProps || narrow) return ctx0
      base = base.drop(out)
    }
    val arr = col(s"${v}__${if (edges) "ids" else "nids"}")
    val elemId = try_element_at(arr, lit((if (i >= 0) i + 1 else i).toInt))
    if (narrow) {
      // only id/label are accessed: the label decodes from the packed id's
      // 16-bit prefix through the plan-time label catalog — NO entity join,
      // no properties-map construction (which was the dominant cost when a
      // query touches just the path endpoints: the g21 hot path)
      val lid = shiftrightunsigned(elemId, 48).cast("int")
      val lname = graph.labelIds.foldLeft(lit(null).cast("string"))((acc, kv) =>
        when(lid === lit(kv._2), lit(kv._1)).otherwise(acc))
      return ctx0.copy(df = base.withColumn(out,
        when(elemId.isNotNull, struct(elemId.as("id"), lname.as("label")))))
    }
    val lookup = entityStructTable(edges)
      .select(col("__lk_id").as(s"${out}_k"), col("__ent").as(out))
    val df = base.withColumn(s"${out}_id", elemId)
      .join(lookup, col(s"${out}_id") === col(s"${out}_k"), "left_outer")
      .drop(s"${out}_id", s"${out}_k")
    ctx0.copy(df = df)
  }

  /** Materialize traversal values for every VLE var the expressions need. */
  private def ensureVleValues(ctx0: Ctx, exprs: Seq[Expr]): Ctx = {
    if (ctx0.df == null) return ctx0
    val needs = exprs.flatMap(vleValueNeeds(_, ctx0)).toSet
    needs.groupBy(_._1).foldLeft(ctx0) { case (c, (v, ks)) =>
      val kinds = ks.map(_._2)
      val c2 = materializeVle(c, v,
        needNodes = kinds.contains("nodes"),
        needEdges = kinds.contains("edges"))
      // element needs: "kind@i" (whole entity) or "kind@i#field"; a
      // position whose every access is an id/label field skips the entity
      // join entirely (narrow struct decoded from the packed id)
      val elems = kinds.filter(_.contains("@")).map { k =>
        val Array(kind, rest) = k.split("@", 2)
        rest.split("#", 2) match {
          case Array(iStr, fld) => ((kind, iStr.toLong), Some(fld))
          case Array(iStr)      => ((kind, iStr.toLong), None)
        }
      }
      elems.groupBy(_._1).toSeq.sortBy(t => (t._1._1, t._1._2)).foldLeft(c2) {
        case (cc, ((kind, i), accs)) =>
          // narrow decode shadows user properties named id/label — only
          // valid when no label stores an escaped collision (hasEscapedProp)
          val narrow = accs.forall(_._2.exists(Set("id", "label"))) &&
            !Seq("id", "label").exists(hasEscapedProp)
          materializeVleElem(cc, v, edges = kind == "edges", i, narrow = narrow)
      }
    }
  }

  private def pathInfo(e: Expr, ctx: Ctx): VarInfo = e match {
    case Var(p) if ctx.vars.get(p).exists(_.kind == VarKind.Path) => ctx.vars(p)
    case other => throw new UnsupportedOperationException(
      s"nodes()/relationships() need a path variable, got $other")
  }

  /** Property map of a bound entity: name → GValue-encoded value. The
    * codec gives every property the same struct type, so maps (and path
    * element arrays built from them) unify across labels with different
    * property schemas — the reference's vertex/edge values carry a full
    * gtype properties object the same way (vertex.h:44-76, edge.h:46-79).
    */
  private def propertiesMap(v: String, ctx: Ctx): Column = {
    val props = entityColumns(ctx.df, v).map(_.stripPrefix(s"${v}__"))
      // gsrc/gdst are the undirected bind's orientation internals
      .filterNot(Set("id", "label", "start_id", "end_id", "gsrc", "gdst")).sorted
    if (props.isEmpty)
      map_from_arrays(array().cast(ArrayType(StringType)),
        array().cast(ArrayType(graft.gvalue.GValueCol.structType)))
    else map(props.flatMap { k =>
      val c = col(s"${v}__$k")
      val dt = ctx.df.schema(s"${v}__$k").dataType
      val enc = graft.gvalue.GValueCol.dynCoerce(c, dt).getOrElse(
        // no dynamic form (maps, structs): canonical JSON string payload
        graft.gvalue.GValueCol.encode(c.cast("string"), StringType))
      Seq(lit(PropNames.unesc(k)), enc)
    }: _*)
  }

  /** nodes(p) / relationships(p) — full entity values, per the reference's
    * traversal layout: vertices (id, label, properties), edges (id,
    * start_id, end_id, label, properties) — traversal.c build_traversal /
    * vertex.h / edge.h. VLE segments contribute their materialized struct
    * arrays (see [[materializeVle]]); for nodes, a VLE segment's sequence
    * starts at the segment's own start node, so only its tail concatenates
    * after the preceding fixed node.
    */
  private def pathMembers(e: Expr, ctx: Ctx, edges: Boolean): Column = {
    val info = pathInfo(e, ctx)
    def isVle(m: String) = ctx.vars.get(m).exists(_.kind == VarKind.VlePath)
    def nodeStruct(m: String) = struct(col(s"${m}__id").as("id"),
      col(s"${m}__label").as("label"), propertiesMap(m, ctx).as("properties"))
    def edgeStruct(m: String) = struct(col(s"${m}__id").as("id"),
      col(s"${m}__start_id").as("start_id"), col(s"${m}__end_id").as("end_id"),
      col(s"${m}__label").as("label"), propertiesMap(m, ctx).as("properties"))
    if (edges) {
      val segs = info.pathEdges.map { m =>
        if (isVle(m)) col(s"${m}__edges") else array(edgeStruct(m))
      }
      if (segs.isEmpty) // single-node path: no relationships
        array().cast(ArrayType(StructType(Seq(
          StructField("id", LongType), StructField("start_id", LongType),
          StructField("end_id", LongType), StructField("label", StringType),
          StructField("properties",
            MapType(StringType, graft.gvalue.GValueCol.structType))))))
      else concat(segs: _*)
    } else {
      val head = array(nodeStruct(info.pathNodes.head))
      val rest = info.pathEdges.zipWithIndex.map { case (m, i) =>
        if (isVle(m)) {
          val ns = col(s"${m}__nodes")
          slice(ns, lit(2), size(ns) - lit(1)) // drop the segment's start node
        } else array(nodeStruct(info.pathNodes(i + 1)))
      }
      concat(head +: rest: _*)
    }
  }

  /** Range/multirange constructors over literal arguments fold to literal
    * trees at compile time. The Column-side constructors (PG-flexible
    * datetime parse chains, sort+merge multirange normalization) build
    * expression trees of thousands of nodes; left inline they dominate
    * analysis/optimization wall time (g26: 10 s of driver stall for 301
    * rows). A constant constructor is evaluated ONCE on a 1-row frame and
    * re-emitted as nested struct/array literals — the same plan Catalyst's
    * ConstantFolding would eventually produce, minus the repeated
    * traversals of the giant unfolded tree.
    */
  private def constFoldCache = Compiler.constFoldCache

  private val constFoldableFns: Set[String] = Set(
    "intrange", "numrange", "tsrange", "tstzrange", "daterange",
    "intmultirange", "int4multirange", "int8multirange", "nummultirange",
    "tsmultirange", "tstzmultirange", "datemultirange",
    "tointrange", "tonumrange", "totsrange", "totstzrange", "todaterange",
    "tointmultirange", "tonummultirange", "totsmultirange",
    "totstzmultirange", "todatemultirange",
    "todate", "totimestamp", "totimestamptz", "tointerval")

  /** Constant-evaluable AST: literals closed under the pure fn whitelist. */
  private def isConstAst(e: Expr): Boolean = e match {
    case Lit(_) => true
    case FnCall(n, as, false) if constFoldableFns(n.toLowerCase) => as.forall(isConstAst)
    case _ => false
  }

  /** Value → literal Column of the given type (structs/arrays rebuilt). */
  private def litOf(v: Any, dt: DataType): Column = (v, dt) match {
    case (null, _) => lit(null).cast(dt)
    case (r: org.apache.spark.sql.Row, st: StructType) =>
      struct(st.fields.zipWithIndex.map { case (f, i) =>
        litOf(r.get(i), f.dataType).as(f.name) }: _*)
    case (s: scala.collection.Seq[_], at: ArrayType) =>
      if (s.isEmpty) lit(Array.empty[Int]).cast(dt)
      else array(s.toSeq.map(e => litOf(e, at.elementType)).toIndexedSeq: _*)
    case _ => lit(v)
  }

  /** Fold `col` (known constant) to its literal form, memoized on `key`.
    * The one-row eval runs with codegen off: janino-compiling the
    * unfolded multi-thousand-node constructor costs seconds, interpreted
    * eval of one row is instant.
    */
  private def foldConstCol(col: Column, key: String): Column = {
    // the fold of a timezone-sensitive constructor (totimestamptz/todate
    // string parsing) depends on the session timeZone, so it is part of
    // the cache key — two sessions with different zones must not share a
    // folded instant (ADVICE r7)
    val tzKey = spark.conf.get("spark.sql.session.timeZone") + "|" + key
    constFoldCache.getOrElseUpdate(tzKey, Compiler.constFoldLock.synchronized {
      // re-check under the lock: another thread may have folded the same
      // key between the lock-free lookup and acquiring the lock
      constFoldCache.get(tzKey).getOrElse {
        val ws = spark.conf.getOption("spark.sql.codegen.wholeStage")
        val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        try {
          val probe = spark.range(1).select(col.as("v"))
          val dt = probe.schema.head.dataType
          litOf(probe.head().get(0), dt)
        } finally {
          ws.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
            spark.conf.set("spark.sql.codegen.wholeStage", _))
          fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
            spark.conf.set("spark.sql.codegen.factoryMode", _))
        }
      }
    })
  }

  // ------------------------------------------- PostGIS literal evaluator

  private final case class GeomSph(name: String, a: Double, rf: Double)
  private final case class GeomBox(is3d: Boolean, x1: Double, y1: Double,
      z1: Double, x2: Double, y2: Double, z2: Double)
  private case object GeomNullD

  /** Driver-side evaluation of constant PostGIS expression trees
    * (GeomWkt domain): geometry in these suites is always a WKT literal,
    * so a closed fn set evaluates eagerly and re-enters the plan as a
    * literal. Returns None (fall through to the columnar kernels) when
    * any input is non-constant or not geometry-shaped; REFERENCE ERROR
    * paths (ST_X over non-point …) throw, which is the parity the replay
    * expects.
    */
  private def geomConst(e: Expr): Option[Any] = e match {
    case Lit(GString(s)) => Some(s)
    case Lit(GInt(i))    => Some(i.toDouble)
    case Lit(GFloat(f))  => Some(f)
    case Un("NEG", x)    => geomConst(x) match {
      case Some(d: Double) => Some(-d); case _ => None
    }
    case FnCall(n0, args, false) =>
      val n = n0.toLowerCase
      def g(i: Int): Option[GeomWkt.G] = geomConst(args(i)) match {
        case Some(gg: GeomWkt.G) => Some(gg)
        case Some(s: String) => scala.util.Try(GeomWkt.parse(s)).toOption
        case _ => None
      }
      def d(i: Int): Option[Double] = geomConst(args(i)) match {
        case Some(x: Double) => Some(x); case _ => None
      }
      n match {
        case "togeometry" => geomConst(args.head) match {
          // box3d::geometry is the 6-face POLYHEDRALSURFACE, box2d the
          // corner polygon (PostGIS BOX3D_to_LWGEOM/BOX2D_to_LWGEOM —
          // postgis.out:3603-3619); carried as EWKT text the downstream
          // ST_AsEWKT passes through
          case Some(b: GeomBox) if b.is3d =>
            Some(GeomWkt.box3dPolyhedralEwkt(b.x1, b.y1, b.z1, b.x2, b.y2, b.z2))
          case Some(b: GeomBox) =>
            Some(GeomWkt.boxPolygonEwkt(b.x1, b.y1, b.x2, b.y2))
          case _ => g(0)
        }
        case "tospheroid" => geomConst(args.head) match {
          case Some(s: String) =>
            val rx = "(?i)SPHEROID\\s*\\[\\s*\"([^\"]*)\"\\s*,\\s*([0-9.eE+-]+)\\s*,\\s*([0-9.eE+-]+)\\s*\\]".r
            rx.findFirstMatchIn(s).map(m =>
              GeomSph(m.group(1), m.group(2).toDouble, m.group(3).toDouble))
          case _ => None
        }
        case "tobox2d" | "tobox3d" => geomConst(args.head) match {
          case Some(b: GeomBox) => // box-to-box recast (toBox3D(x)::box2d)
            if (n == "tobox2d") Some(GeomBox(is3d = false, b.x1, b.y1, 0, b.x2, b.y2, 0))
            else Some(b.copy(is3d = true))
          case Some(s: String) =>
            val nums = "-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?".r
              .findAllIn(s).map(_.toDouble).toVector
            // the 3D in BOX3D is part of the token, not a coordinate
            val vs = if (s.toUpperCase.contains("BOX3D")) nums.drop(1) else nums
            if (n == "tobox2d" && vs.length == 4)
              Some(GeomBox(is3d = false, vs(0), vs(1), 0, vs(2), vs(3), 0))
            else if (n == "tobox3d" && vs.length == 6)
              Some(GeomBox(is3d = true, vs(0), vs(1), vs(2), vs(3), vs(4), vs(5)))
            else None
          case _ => None
        }
        // bbox cache add/drop is a storage hint — identity on the value
        // (postgis.out prints the same EWKT back)
        case "postgis_addbbox" | "postgis_dropbbox" => g(0)
        case "st_asewkt" if args.length == 1 => g(0).map(GeomWkt.renderEwkt)
        case "st_astext" if args.length == 1 =>
          g(0).map(gg => GeomWkt.renderEwkt(GeomWkt.withSrid(gg, 0)))
        case "st_x" | "st_y" | "st_z" | "st_m" =>
          g(0).map(gg =>
            GeomWkt.pointCoord(gg, n.stripPrefix("st_")) match {
              case Some(v) => v
              case None => GeomNullD
            })
        case "st_scale" =>
          if (args.length == 2) for { gg <- g(0); f <- g(1) } yield f match {
            case GeomWkt.GPoint(Some(p), fd, _) =>
              GeomWkt.scale(gg, p.x, p.y, if (fd.z) p.z else 1.0,
                if (fd.m) Some(p.m) else None)
            case _ => throw new IllegalArgumentException(
              "ST_Scale factor must be a point")
          }
          else if (args.length == 3 && geomConst(args(1)).exists(_.isInstanceOf[GeomWkt.G]))
            // ST_Scale(geom, factor, false-origin): translate to the
            // origin, scale, translate back (PostGIS 3-geometry form)
            for { gg <- g(0); f <- g(1); o <- g(2) } yield (f, o) match {
              case (GeomWkt.GPoint(Some(fp), fd, _), GeomWkt.GPoint(Some(op), _, _)) =>
                val moved = GeomWkt.mapPts(gg, p =>
                  graft.functions.GeomKernels.Pt(p.x - op.x, p.y - op.y, p.z - op.z, p.m))
                val scaled = GeomWkt.scale(moved, fp.x, fp.y,
                  if (fd.z) fp.z else 1.0, if (fd.m) Some(fp.m) else None)
                GeomWkt.mapPts(scaled, p =>
                  graft.functions.GeomKernels.Pt(p.x + op.x, p.y + op.y, p.z + op.z, p.m))
              case _ => throw new IllegalArgumentException(
                "ST_Scale factor/origin must be points")
            }
          else if (args.length == 3)
            for { gg <- g(0); fx <- d(1); fy <- d(2) }
              yield GeomWkt.scale(gg, fx, fy, 1.0, None)
          else
            for { gg <- g(0); fx <- d(1); fy <- d(2); fz <- d(3) }
              yield GeomWkt.scale(gg, fx, fy, fz, None)
        case "st_makepoint" =>
          val ds = args.indices.map(d)
          if (ds.exists(_.isEmpty)) None
          else {
            val v = ds.map(_.get)
            val (pt, dim) = v.length match {
              case 2 => (graft.functions.GeomKernels.Pt(v(0), v(1), 0, 0),
                GeomWkt.Dim(z = false, m = false))
              case 3 => (graft.functions.GeomKernels.Pt(v(0), v(1), v(2), 0),
                GeomWkt.Dim(z = true, m = false))
              case _ => (graft.functions.GeomKernels.Pt(v(0), v(1), v(2), v(3)),
                GeomWkt.Dim(z = true, m = true))
            }
            Some(GeomWkt.GPoint(Some(pt), dim, 0))
          }
        case "st_makepointm" =>
          for { x <- d(0); y <- d(1); m <- d(2) }
            yield GeomWkt.GPoint(Some(graft.functions.GeomKernels.Pt(x, y, 0, m)),
              GeomWkt.Dim(z = false, m = true), 0)
        case "st_ispolygoncw"  => g(0).map(GeomWkt.isPolygonOriented(_, ccw = false))
        case "st_ispolygonccw" => g(0).map(GeomWkt.isPolygonOriented(_, ccw = true))
        case "st_simplify" =>
          for { gg <- g(0); tol <- d(1) } yield GeomWkt.simplifyG(gg, tol)
        case "st_intersection" if args.length == 2 || args.length == 3 =>
          // the optional third arg is gridSize (ignored at gridSize <= 0,
          // the only fixture form)
          (g(0), g(1)) match {
            // point-set forms only; anything else stays columnar
            case (Some(a @ (_: GeomWkt.GPoint | _: GeomWkt.GMPoint)),
                  Some(b @ (_: GeomWkt.GPoint | _: GeomWkt.GMPoint))) =>
              Some(GeomWkt.pointIntersection(a, b))
            case _ => None
          }
        case "x" | "y" | "z" | "m" if args.length == 1 =>
          // bare accessor aliases over geometry (postgis.out:1997-2016)
          g(0).map(gg => GeomWkt.pointCoord(gg, n) match {
            case Some(v) => v
            case None => GeomNullD
          })
        case "st_distancespheroid" =>
          val sph = if (args.length >= 3) geomConst(args(2)) match {
            case Some(GeomSph(_, a, rf)) => Some((a, rf))
            case Some(s: String) =>
              val rx = "(?i)SPHEROID\\s*\\[\\s*\"[^\"]*\"\\s*,\\s*([0-9.eE+-]+)\\s*,\\s*([0-9.eE+-]+)".r
              rx.findFirstMatchIn(s).map(m => (m.group(1).toDouble, m.group(2).toDouble))
            case _ => None
          } else Some((6378137.0, 298.257223563))
          for { a <- g(0); b <- g(1); s <- sph }
            yield GeomWkt.distanceSpheroid(a, b, s._1, s._2)
        case "st_isvalidtrajectory" => g(0).map(GeomWkt.isValidTrajectory)
        // temporally disjoint trajectories → SQL NULL (PostGIS returns
        // NULL, postgis.out blank cells), not NaN
        case "st_closestpointofapproach" =>
          for { a <- g(0); b <- g(1) } yield {
            val t = GeomWkt.cpaOf(GeomWkt.trajectory(a), GeomWkt.trajectory(b))._1
            if (t.isNaN) GeomNullD else t
          }
        case "st_distancecpa" =>
          for { a <- g(0); b <- g(1) } yield {
            val d = GeomWkt.cpaOf(GeomWkt.trajectory(a), GeomWkt.trajectory(b))._2
            if (d.isNaN) GeomNullD else d
          }
        case "st_cpawithin" =>
          // the CYPHER surface's ST_CPAWithin is wired to
          // ST_IsValidTrajectory of the FIRST argument (gtype_postgis.c:
          // 813-829 DirectFunctionCall3(ST_IsValidTrajectory, …) — a
          // reference miswiring its own goldens record: even temporally
          // disjoint lines return true, postgis.out:3440-3445; non-M
          // input emits the NOTICE and returns false, not an error)
          for { a <- g(0) } yield GeomWkt.isValidTrajectory(a)
        case "st_cpawithin_sql" =>
          // the raw-SQL surface keeps the documented semantics: CPA
          // distance within d over the shared M-range; disjoint → false
          for { a <- g(0); b <- g(1); dd <- d(2) } yield
            if (!GeomWkt.isValidTrajectory(a) || !GeomWkt.isValidTrajectory(b)) false
            else {
              val dist = GeomWkt.cpaOf(
                GeomWkt.trajectory(a), GeomWkt.trajectory(b))._2
              !dist.isNaN && dist <= dd
            }
        case "st_xmin" | "st_ymin" | "st_zmin" | "st_xmax" | "st_ymax" | "st_zmax" =>
          geomConst(args.head) match {
            case Some(b: GeomBox) => Some(n match {
              case "st_xmin" => b.x1; case "st_ymin" => b.y1; case "st_zmin" => b.z1
              case "st_xmax" => b.x2; case "st_ymax" => b.y2; case _ => b.z2
            })
            case _ => g(0).map { gg =>
              val ps = GeomWkt.allPts(gg)
              if (ps.isEmpty) GeomNullD else n match {
                case "st_xmin" => ps.map(_.x).min; case "st_ymin" => ps.map(_.y).min
                case "st_zmin" => ps.map(_.z).min; case "st_xmax" => ps.map(_.x).max
                case "st_ymax" => ps.map(_.y).max; case _ => ps.map(_.z).max
              }
            }
          }
        case _ => None
      }
    case _ => None
  }

  /** Constant geometry's 2-D bbox as a literal struct(x1,y1,x2,y2). */
  private def geomBBoxLit(g: GeomWkt.G): Column = {
    val (x1, y1, x2, y2) = GeomWkt.bbox2d(g).getOrElse(
      throw new IllegalArgumentException("bbox of empty geometry"))
    struct(lit(x1).as("x1"), lit(y1).as("y1"), lit(x2).as("x2"), lit(y2).as("y2"))
  }

  /** Columnar 2-D bbox of an EWKT string column (a geometry stored as a
    * property renders as EWKT): strip SRID/type tokens, split coordinate
    * groups on commas, min/max the first two numbers of each group.
    */
  private def geomStrBBox(c0: Column, ctx: Ctx): Column = {
    val c = dataTypeOpt(c0, ctx) match {
      case Some(t) if graft.gvalue.GValueCol.isGValue(t) => c0.getField("s")
      // a dynamic `::geometry` compiles to a point struct (x,y[,z,m]) —
      // its bbox is the degenerate (x,y,x,y); casting a struct to string
      // would render Spark's '{1.0, 2.0}' text and silently null out the
      // coordinate parse (ADVICE r7)
      case Some(st: StructType) if st.fieldNames.contains("x") &&
          st.fieldNames.contains("y") =>
        return struct(c0.getField("x").cast("double").as("x1"),
          c0.getField("y").cast("double").as("y1"),
          c0.getField("x").cast("double").as("x2"),
          c0.getField("y").cast("double").as("y2"))
      case Some(t @ (_: StructType | _: ArrayType)) =>
        throw new UnsupportedOperationException(
          s"bbox operator over non-geometry composite type ${t.simpleString}")
      case _ => c0.cast("string")
    }
    val groups = split(regexp_replace(
      regexp_replace(c, "(?i)^SRID=[0-9]+;", ""), "[A-Za-z()]+", ""), ",")
    val xs = transform(groups, t => split(trim(t), "\\s+").getItem(0).cast("double"))
    val ys = transform(groups, t => split(trim(t), "\\s+").getItem(1).cast("double"))
    struct(array_min(xs).as("x1"), array_min(ys).as("y1"),
      array_max(xs).as("x2"), array_max(ys).as("y2"))
  }

  /** Column-side bbox operator over two bbox structs (same table as
    * GeomWkt.bboxOp).
    */
  private def bboxColCmp(op: String, a: Column, b: Column): Column = {
    def f(c: Column, n: String) = c.getField(n)
    op match {
      case "@" | "<@" => f(a, "x1") >= f(b, "x1") && f(a, "x2") <= f(b, "x2") &&
        f(a, "y1") >= f(b, "y1") && f(a, "y2") <= f(b, "y2")
      case "~" | "@>" => bboxColCmp("@", b, a)
      case "&&" => f(a, "x1") <= f(b, "x2") && f(a, "x2") >= f(b, "x1") &&
        f(a, "y1") <= f(b, "y2") && f(a, "y2") >= f(b, "y1")
      case "~="  => a === b
      case "<<"  => f(a, "x2") < f(b, "x1")
      case ">>"  => f(a, "x1") > f(b, "x2")
      case "<<|" => f(a, "y2") < f(b, "y1")
      case "|>>" => f(a, "y1") > f(b, "y2")
      case "&<"  => f(a, "x2") <= f(b, "x2")
      case "&>"  => f(a, "x1") >= f(b, "x1")
      case "&<|" => f(a, "y2") <= f(b, "y2")
      case "|&>" => f(a, "y1") >= f(b, "y1")
      case other => throw new UnsupportedOperationException(s"$other over geometry")
    }
  }

  /** Literal Column for a geomConst result. */
  private def geomLit(v: Any): Column = v match {
    case GeomNullD => lit(null).cast("double")
    case dd: Double => lit(dd)
    case b: Boolean => lit(b)
    case s: String => lit(s)
    case gg: GeomWkt.G => GeomWkt.litColumn(gg)
    case GeomSph(nm, a, rf) =>
      lit(s"""SPHEROID("$nm",${GeomWkt.numStr(a)},${GeomWkt.numStr(rf)})""")
    case GeomBox(false, x1, y1, _, x2, y2, _) =>
      lit(s"BOX(${GeomWkt.numStr(x1)} ${GeomWkt.numStr(y1)}," +
        s"${GeomWkt.numStr(x2)} ${GeomWkt.numStr(y2)})")
    case GeomBox(true, x1, y1, z1, x2, y2, z2) =>
      lit(s"BOX3D(${GeomWkt.numStr(x1)} ${GeomWkt.numStr(y1)} ${GeomWkt.numStr(z1)}," +
        s"${GeomWkt.numStr(x2)} ${GeomWkt.numStr(y2)} ${GeomWkt.numStr(z2)})")
    case other => throw new IllegalStateException(s"geomLit: $other")
  }

  /** Empty same-schema probe frames, one per ctx frame (identity-keyed).
    * `ctx.df.select(c).schema` re-runs the whole analyzer over the
    * accumulated plan on EVERY type probe — O(plan) per compileExpr
    * callsite, which turned heavy-expression queries into multi-second
    * driver stalls (g26: 10 s of build time). Typing only needs the
    * frame's output attributes, so resolve against an empty LocalRelation
    * with the same schema instead; name-based resolution behaves
    * identically, and the rare plan-bound column (resolved exprId) falls
    * back to the real frame.
    */
  private val typeProbes =
    new java.util.IdentityHashMap[org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame]()

  /** Per-frame type memo (r17, guide §1.2 driver-side cost): even against
    * the empty probe frame, `select(c).schema` runs a full analyzer pass
    * over the COLUMN's tree — for kernel-expanded expressions (geometric
    * operators compile to ~100-node trees) that is milliseconds per probe,
    * and nested operators re-probe the same subtree at every enclosing
    * level (sampled: 55% of g25's 1.2 s construction). Structural
    * Expression equality is exact (same unresolved tree + same frame ⇒
    * same resolved type), and hashing a tree is ~100× cheaper than
    * analyzing it. Keyed by frame identity like typeProbes; lifetime is
    * the single statement's Compiler instance.
    */
  private val typeMemo = new java.util.IdentityHashMap[
    org.apache.spark.sql.DataFrame,
    java.util.HashMap[org.apache.spark.sql.catalyst.expressions.Expression, DataType]]()

  /** Static Spark type of a compiled column (resolved against the ctx frame). */
  private def dataTypeOf(c: Column, ctx: Ctx): DataType =
    if (ctx.df == null) NullType
    else {
      val probe = Option(typeProbes.get(ctx.df)).getOrElse {
        val p = ctx.df.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), ctx.df.schema)
        typeProbes.put(ctx.df, p); p
      }
      val memo = Option(typeMemo.get(ctx.df)).getOrElse {
        val m = new java.util.HashMap[
          org.apache.spark.sql.catalyst.expressions.Expression, DataType]()
        typeMemo.put(ctx.df, m); m
      }
      val key = org.apache.spark.sql.graft.Bridge.expression(c)
      val hit = memo.get(key)
      if (hit != null) hit
      else {
        val dt =
          try probe.select(c).schema.head.dataType
          catch { case scala.util.control.NonFatal(_) =>
            ctx.df.select(c).schema.head.dataType }
        memo.put(key, dt)
        dt
      }
    }

  /** Like dataTypeOf but never throws (lambda-bound columns don't resolve). */
  private def dataTypeOpt(c: Column, ctx: Ctx): Option[DataType] =
    scala.util.Try(dataTypeOf(c, ctx)).toOption

  /** Equality that handles dynamic (GValueCol) operands: encode the typed
    * side, compare order keys (cross-type 1 = 1.0 like gtype_btree_cmp).
    */
  private def gAwareCmp(op: String, l: Column, r: Column, ctx: Ctx,
      lRaw: Option[Expr] = None, rRaw: Option[Expr] = None): Option[Column] = {
    import graft.gvalue.GValueCol
    val lt = dataTypeOpt(l, ctx)
    val rt = dataTypeOpt(r, ctx)
    def cmpOn(ka: Column, kb: Column): Option[Column] = op match {
      case "="  => Some(ka === kb)
      case "<>" => Some(ka =!= kb)
      case "<"  => Some(ka < kb)
      case "<=" => Some(ka <= kb)
      case ">"  => Some(ka > kb)
      case ">=" => Some(ka >= kb)
      case _    => None
    }
    (lt, rt) match {
      // timetz × time(tz): compare UTC-normalized micros (PG timetz_cmp;
      // a bare time promotes at the UTC session zone, offset 0)
      case (Some(a), Some(b)) if isTimetzStruct(a) || isTimetzStruct(b) =>
        def key(c: Column, t: DataType): Column =
          if (isTimetzStruct(t))
            c.getField("us") - c.getField("off").cast("long") * 1000000L
          else c.cast("long")
        return cmpOn(key(l, a), key(r, b))
      // interval × interval: PG interval_cmp folds months into 30-day
      // blocks and days into micros — NOT fieldwise struct order
      // ((0,31,0) sorts above (1,0,0))
      case (Some(a), Some(b)) if isIntervalStruct(a) && isIntervalStruct(b) =>
        def key(c: Column): Column =
          (c.getField("months").cast("long") * 30L + c.getField("days").cast("long")) *
            86400000000L + c.getField("us")
        return cmpOn(key(l), key(r))
      // range × range: the reference's range_cmp orders by RAW bounds
      // with bracket flags (no canonicalization — range.out has
      // `intrange(0,1,'()') > intrange(0,1,'[]')` TRUE): lower bound
      // first (null = −∞; for equal values an EXCLUSIVE lower is
      // larger), then upper (null = +∞; an INCLUSIVE upper is larger).
      // Plain fieldwise struct order gets the flag directions wrong.
      case (Some(a), Some(b)) if isRangeStruct(a) && isRangeStruct(b) =>
        def key(c: Column): Column = struct(
          when(c.getField("lo").isNull, lit(0)).otherwise(lit(1)).as("lof"),
          c.getField("lo").as("lo"),
          when(c.getField("lo_inc"), lit(0)).otherwise(lit(1)).as("loi"),
          when(c.getField("hi").isNull, lit(1)).otherwise(lit(0)).as("hif"),
          c.getField("hi").as("hi"),
          when(c.getField("hi_inc"), lit(1)).otherwise(lit(0)).as("hii"))
        return cmpOn(key(l), key(r))
      case _ => ()
    }
    // two dynamic ARRAYS (mixed literal lists compile to array-of-struct):
    // element-wise canonical comparison, so [1, [2]] = [1.0, [2.0]] holds
    // exactly as it does inside a single TArray value
    (lt, rt) match {
      case (Some(ArrayType(a, _)), Some(ArrayType(b, _)))
          if GValueCol.isGValue(a) && GValueCol.isGValue(b) =>
        val key = (c: Column) => transform(c, e => GValueCol.orderKey(e))
        return op match {
          case "="  => Some(key(l) === key(r))
          case "<>" => Some(key(l) =!= key(r))
          case "<"  => Some(key(l) < key(r))
          case "<=" => Some(key(l) <= key(r))
          case ">"  => Some(key(l) > key(r))
          case ">=" => Some(key(l) >= key(r))
          case _    => None
        }
      case _ => ()
    }
    def enc(c: Column, dt: Option[DataType]): Option[Column] = dt match {
      case Some(t) if GValueCol.isGValue(t) => Some(c)
      // dynCoerce also carries typed arrays into the dynamic form, so a
      // dynamic property column compares against a list literal
      // (expr.sql CASE n.j WHEN [0,1,2])
      case Some(t) => GValueCol.dynCoerce(c, t)
        .orElse(scala.util.Try(GValueCol.encode(c, t)).toOption)
      case None => None
    }
    // gtype family of a native Spark type: cross-FAMILY comparisons order
    // by the type tag (reference compare_gtype_scalar_values; expr.sql:36
    // `'string' < true`) — native Spark comparison would ANSI-cast and
    // throw. Same-family comparisons stay native (codegen, pushdown).
    def family(t: DataType): Int = t match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType => 1
      case StringType => 2
      case BooleanType => 3
      case TimestampType | TimestampNTZType | DateType => 4
      case _ => 0 // arrays/structs/etc: leave native
    }
    val crossFamily = (lt, rt) match {
      case (Some(a), Some(b)) =>
        family(a) != 0 && family(b) != 0 && family(a) != family(b)
      case _ => false
    }
    // a constant container literal against a dynamic column rides the
    // dynamic object/array literal encoding (CASE n.j WHEN {i:1})
    def encWithRaw(c: Column, dt: Option[DataType], raw: Option[Expr]): Option[Column] =
      enc(c, dt).orElse(dt match {
        case Some(_: MapType) =>
          raw.flatMap(litGValue).map(GValueCol.gLit)
        case _ => None
      })
    val anyG = lt.exists(GValueCol.isGValue) || rt.exists(GValueCol.isGValue)
    if (!anyG && !crossFamily) None
    else (encWithRaw(l, lt, lRaw), encWithRaw(r, rt, rRaw)) match {
      case (Some(a), Some(b)) => op match {
        case "="  => Some(GValueCol.eqv(a, b))
        case "<>" => Some(!GValueCol.eqv(a, b))
        case "<"  => Some(GValueCol.orderKey(a) < GValueCol.orderKey(b))
        case "<=" => Some(GValueCol.orderKey(a) <= GValueCol.orderKey(b))
        case ">"  => Some(GValueCol.orderKey(a) > GValueCol.orderKey(b))
        case ">=" => Some(GValueCol.orderKey(a) >= GValueCol.orderKey(b))
        case _    => None
      }
      case _ => None
    }
  }

  private def entityField(e: Expr, field: String, ctx: Ctx): Column = e match {
    case Var(v) if ctx.vars.get(v).exists(_.isEntity) => col(s"${v}__$field")
    case other => compileExpr(other, ctx).getField(field)
  }

  private def regexp_quote(e: Expr): String = e match {
    case Lit(GString(s)) => java.util.regex.Pattern.quote(s)
    case other => throw new UnsupportedOperationException(s"needs string literal, got $other")
  }
  private def litString(e: Expr): String = e match {
    case Lit(GString(s)) => s
    case other => throw new UnsupportedOperationException(s"needs string literal, got $other")
  }

  /** A parsed GValue back to literal AST — containers become ListLit/
    * MapLit so their compilation shares the dynamic-encoding paths.
    */
  private def gvalueToAst(v: GValue): Expr = v match {
    case GArray(items)  => ListLit(items.map(gvalueToAst).toList)
    case GMap(entries)  => MapLit(entries.toList.map { case (k, x) => k -> gvalueToAst(x) })
    case other          => Lit(other)
  }

  /** Top-level elements of a PG array literal '{a, b, "c,d"}' (arrays.c
    * array_in quoting rules: double quotes protect separators).
    */
  private def pgArrayElems(s0: String): List[String] = {
    val s = s0.trim
    require(s.startsWith("{") && s.endsWith("}"), s"bad array literal: $s0")
    val body = s.substring(1, s.length - 1)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false; var depth = 0
    body.foreach {
      case '"' => inQ = !inQ
      case c @ ('{' | '[') if !inQ => depth += 1; cur += c
      case c @ ('}' | ']') if !inQ => depth -= 1; cur += c
      case ',' if !inQ && depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty || out.nonEmpty) out += cur.result().trim
    out.toList
  }

  private def litColumn(v: GValue): Column = v match {
    case GNull        => lit(null)
    case GBool(b)     => lit(b)
    case GInt(i)      => lit(i)
    case GFloat(f)    => lit(f)
    case GNumeric(n)  => lit(n.bigDecimal)
    case GString(s)   => lit(s)
    case GArray(xs)   => array(xs.map(litColumn): _*)
    case GMap(m)      => map(m.toSeq.flatMap { case (k, x) => Seq(lit(k), litColumn(x)) }: _*)
    case GDate(d)     => lit(java.time.LocalDate.ofEpochDay(d.toLong))
    case GTimestamp(us) => lit(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
    case other        => throw new UnsupportedOperationException(s"literal not supported: ${other.render}")
  }

  private def gValueToAny(v: GValue): Any = v match {
    case GNull      => null
    case GBool(b)   => b
    case GInt(i)    => i
    case GFloat(f)  => f
    case GString(s) => s
    case GNumeric(n) => n.bigDecimal
    case other      => throw new UnsupportedOperationException(s"IN literal: ${other.render}")
  }
}

/** A pattern references a label no entity has ever carried. MERGE treats
  * this as "no existing instances" (empty match), so it must be
  * distinguishable from genuine compile failures that also surface as
  * IllegalArgumentException (ADVICE r3: a broad catch silently returned
  * zero rows for malformed patterns).
  */
final class UnknownLabelException(msg: String) extends IllegalArgumentException(msg)

object Compiler {
  /** Cap for unbounded `*..` expansion; edge-uniqueness already bounds paths
    * by |E|, this bounds the *plan* size (each hop is one join).
    */
  val VleMaxHops = 10

  private val IsoDateRe =
    """(\d{4})-(\d{2})-(\d{2})""".r
  private val IsoTsRe =
    """(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::(\d{2})(\.\d{1,6})?)?(?:Z|\+00(?::?00)?)?""".r

  /** Fold a temporal cast of a string literal to its GValue for manifest
    * prune hints (r15). ONLY strict ISO forms in UTC: for these,
    * java.time parsing provably agrees with the runtime kernels
    * (pgTimestampParse / todate both ISO-parse first, session zone UTC).
    * Anything else — PG's MM/DD/YYYY styles, day names, non-UTC offsets,
    * 'infinity' — returns None: no hint, never a wrong one.
    */
  private[graft] def foldTemporalLit(fn: String,
      s0: String): Option[graft.gvalue.GValue] = {
    import graft.gvalue.{GDate, GTimestamp}
    val s = s0.trim
    try fn match {
      case "todate" => s match {
        case IsoDateRe(y, m, d) => Some(GDate(java.time.LocalDate
          .of(y.toInt, m.toInt, d.toInt).toEpochDay.toInt))
        case _ => None
      }
      case _ => s match { // totimestamp / totimestamptz (UTC session zone)
        case IsoDateRe(y, m, d) => Some(GTimestamp(java.time.LocalDate
          .of(y.toInt, m.toInt, d.toInt).toEpochDay * 86400000000L))
        case IsoTsRe(y, mo, d, h, mi, se, frac) =>
          val day = java.time.LocalDate.of(y.toInt, mo.toInt, d.toInt).toEpochDay
          val secs = h.toLong * 3600 + mi.toLong * 60 +
            Option(se).map(_.toLong).getOrElse(0L)
          val us = Option(frac).map(f =>
            (f.drop(1) + "000000").take(6).toLong).getOrElse(0L)
          Some(GTimestamp((day * 86400L + secs) * 1000000L + us))
        case _ => None
      }
    } catch { case _: RuntimeException => None } // out-of-range fields: no hint
  }

  /** `topoint/topath/topolygon('…literal…')::geometry` — the PG-builtin
    * geometric → PostGIS conversion over a constant (point→POINT,
    * path→LINESTRING, polygon→POLYGON with its ring closed; prints hex
    * EWKB — postgis.out:3597-3615).
    */
  def pgGeoCastConst(e: Expr): Option[graft.functions.GeomWkt.G] = e match {
    case FnCall("togeometry",
        List(FnCall(kind @ ("topoint" | "topath" | "topolygon"),
          List(Lit(graft.gvalue.GString(s0))), _)), _) =>
      import graft.functions.{GeomKernels, GeomWkt}
      val pts = "\\(\\s*(-?[0-9.eE+]+)\\s*,\\s*(-?[0-9.eE+]+)\\s*\\)".r
        .findAllMatchIn(s0.stripPrefix("\"").stripSuffix("\""))
        .map(m => GeomKernels.Pt(m.group(1).toDouble, m.group(2).toDouble, 0, 0))
        .toVector
      val noDim = GeomWkt.Dim(z = false, m = false)
      Some(kind match {
        case "topoint" => GeomWkt.GPoint(pts.headOption, noDim, 0)
        case "topath"  => GeomWkt.GLine(pts, noDim, 0)
        case _ =>
          GeomWkt.GPoly(Vector(
            if (pts.nonEmpty && pts.head != pts.last) pts :+ pts.head else pts),
            noDim, 0)
      })
    case _ => None
  }

  /** PostGIS surface evaluated driver-side over constant WKT literals
    * (GeomWkt). Non-constant args fall back to the columnar kernels.
    */
  val geomConstFns: Set[String] = Set(
    "togeometry", "tobox2d", "tobox3d", "tospheroid",
    "postgis_addbbox", "postgis_dropbbox",
    "st_asewkt", "st_astext", "st_x", "st_y", "st_z", "st_m", "st_scale",
    "st_makepoint", "st_makepointm", "st_ispolygoncw", "st_ispolygonccw",
    "st_simplify", "st_intersection", "st_distancespheroid",
    "st_isvalidtrajectory", "st_closestpointofapproach", "st_distancecpa",
    "st_cpawithin", "st_cpawithin_sql", "st_xmin", "st_ymin", "st_zmin", "st_xmax", "st_ymax",
    "st_zmax", "x", "y", "z", "m")

  /** Internal entity/gtype constructors with constG evaluation
    * (vertex.sql/edge.sql value surface).
    */
  val entityCtorFns: Set[String] = Set(
    "build_vertex", "build_edge", "build_traversal", "build_variable_edge",
    "gtype_build_map", "gtype_build_list")

  /** PostGIS 2-D bounding-box operator names (geometry operator catalog). */
  val geomBoxOps: Set[String] = Set("@", "~", "&&", "~=", "@>", "<@",
    "&<", "&>", "<<", ">>", "<<|", "|>>", "&<|", "|&>")

  /** PostGIS n-D box operators (GIDX family): overlap / contains / within /
    * same over every dimension both operands carry. `~~` (ND contains)
    * arrives as the LIKE StringOp — PG resolves `~~` by operand type — and
    * is probed there.
    */
  val geomNdOps: Set[String] = Set("&&&", "~~", "@@", "~~=")

  /** Range/multirange constructors whose Column bodies are large enough
    * (datetime parse chains, multirange normalization) to warrant
    * compile-time constant folding when every argument is constant.
    */
  val rangeCtorFns: Set[String] = Set(
    "intrange", "numrange", "tsrange", "tstzrange", "daterange",
    "intmultirange", "int4multirange", "int8multirange", "nummultirange",
    "tsmultirange", "tstzmultirange", "datemultirange",
    "tointrange", "tonumrange", "totsrange", "totstzrange", "todaterange",
    "tointmultirange", "tonummultirange", "totsmultirange",
    "totstzmultirange", "todatemultirange")

  /** Folded constant-constructor columns, shared across Compiler
    * instances (values are deterministic functions of the key; literal
    * Columns are plan-independent, so cross-session reuse is safe).
    */
  private[cypher] val constFoldCache:
      scala.collection.concurrent.Map[String, org.apache.spark.sql.Column] =
    scala.jdk.CollectionConverters.ConcurrentMapHasAsScala(
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Column]()).asScala

  /** Serializes foldConstCol's codegen-conf flip/probe/restore — concurrent
    * compiles would otherwise restore each other's conf values (ADVICE r7).
    */
  private[cypher] val constFoldLock = new Object

  /** Aggregate function names (reference catalog: SURVEY.md §2.2,
    * sql/postgraph-aggregation.sql.in).
    */
  val AggFns: Set[String] = Set("count", "sum", "avg", "min", "max", "collect",
    "stdev", "stdevp", "percentilecont", "percentiledisc")

  /** Spark-builtin two-column stat aggregates the reference also exposes
    * (old regress aggregation.sql:38-130) — resolved via the registry
    * fallthrough; listed here so dynamic inputs get the numeric decode and
    * containment checks treat them as aggregates.
    */
  val TwoColStatAggs: Set[String] = Set("corr", "covar_pop", "covar_samp",
    "regr_sxx", "regr_syy", "regr_sxy", "regr_slope", "regr_intercept",
    "regr_avgx", "regr_avgy", "regr_r2", "regr_count")

  /** User property names that collide with the entity layout's internal
    * columns are STORED escaped — the reference keeps a vertex's `id`
    * property fully separate from its graphid (vertex.h accessors vs
    * property map), so `CREATE (:v {id: 'x'})` must work and `n.id` must
    * read the PROPERTY (null when absent), never the internal id.
    */
  /** Compile-time constant evaluation of a literal expression tree —
    * containers at any depth (the codec carries them recursively) plus the
    * inline cast forms the regress fixtures use (`1.0::numeric`). Shared
    * by the compiler's literal lowering and the write path's constEval.
    */
  /** Every variable name mentioned anywhere inside an expression tree
    * (generic product walk — sub-structures like Option/List/Map carry
    * through).
    */
  private[cypher] def varRefs(e: Expr): Set[String] = {
    def walk(a: Any): Iterator[String] = a match {
      case Var(n) => Iterator(n)
      case p: Product => p.productIterator.flatMap(walk)
      case xs: Iterable[_] => xs.iterator.flatMap(walk)
      case _ => Iterator.empty
    }
    walk(e).toSet
  }

  private[cypher] def litGValue(e: Expr): Option[GValue] = e match {
    case Lit(g) => Some(g)
    case Un("NEG", x) => litGValue(x).collect {
      case GInt(i)     => GInt(-i)
      case GFloat(f)   => GFloat(-f)
      case GNumeric(n) => GNumeric(-n)
    }
    case FnCall("tonumeric", List(x), _) => litGValue(x).collect {
      case GInt(i)     => GNumeric(BigDecimal(i))
      // float8→numeric drops trailing zeros (PG float8_numeric goes
      // through the shortest text form: 1.0::numeric prints `1::numeric`,
      // cypher_set.out:380)
      case GFloat(f)   => GNumeric(BigDecimal(
        java.math.BigDecimal.valueOf(f).stripTrailingZeros))
      case n: GNumeric => n
    }
    case FnCall("tofloat", List(x), _) => litGValue(x).collect {
      case GInt(i)     => GFloat(i.toDouble)
      case f: GFloat   => f
      case GNumeric(n) => GFloat(n.toDouble)
    }
    case FnCall("tointeger" | "toint", List(x), _) => litGValue(x).collect {
      case i: GInt     => i
      case GFloat(f)   => GInt(f.toLong)
      case GNumeric(n) => GInt(n.toLong)
    }
    case FnCall("togeometry", List(Lit(GString(s))), _) =>
      // geometry-valued property literal (postgis.sql CREATE {i: '…'
      // ::geometry}): stored as its normalized EWKT render; the bbox
      // operator family parses it back columnar (geomStrBBox)
      scala.util.Try(GString(graft.functions.GeomWkt.renderEwkt(
        graft.functions.GeomWkt.parse(s)))).toOption
    case ListLit(items) =>
      val gs = items.map(litGValue)
      if (gs.forall(_.isDefined)) Some(GArray(gs.map(_.get).toVector)) else None
    case MapLit(entries) =>
      val gs = entries.map { case (k, v) => litGValue(v).map(k -> _) }
      if (gs.forall(_.isDefined)) Some(GMap.of(gs.map(_.get): _*)) else None
    case _ => None
  }

  object PropNames {
    private val Reserved = Set("id", "label", "start_id", "end_id")
    // stem = the key with every trailing `_p$` layer removed; escaping any
    // key whose stem is reserved (not just reserved keys themselves) makes
    // esc injective — a user property literally named `id_p$` stores as
    // `id_p$_p$` instead of aliasing the escaped `id`
    private def stem(k: String): String = {
      var s = k
      while (s.endsWith("_p$")) s = s.dropRight(3)
      s
    }
    def esc(k: String): String = if (Reserved(stem(k))) k + "_p$" else k
    def unesc(k: String): String =
      if (k.endsWith("_p$") && Reserved(stem(k))) k.dropRight(3) else k
  }

  object VarKind extends Enumeration {
    val Vertex, Edge, Scalar, Path, VlePath = Value
  }
  final case class VarInfo(kind: VarKind.Value, pathNodes: Seq[String] = Nil,
      pathEdges: Seq[String] = Nil, derived: Boolean = false) {
    def isEntity: Boolean = kind == VarKind.Vertex || kind == VarKind.Edge
  }
  object VarInfo {
    val vertex: VarInfo = VarInfo(VarKind.Vertex)
    val edge: VarInfo = VarInfo(VarKind.Edge)
    val scalar: VarInfo = VarInfo(VarKind.Scalar)
    val vlePath: VarInfo = VarInfo(VarKind.VlePath)
    def path(nodes: Seq[String], edges: Seq[String]): VarInfo =
      VarInfo(VarKind.Path, nodes, edges)
  }

  final case class Ctx(df: DataFrame, vars: ListMap[String, VarInfo], projected: Boolean)
  object Ctx {
    val empty: Ctx = Ctx(null, ListMap.empty, projected = false)
  }
}
