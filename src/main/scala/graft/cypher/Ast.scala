package graft.cypher

import graft.gvalue.GValue

/** Cypher AST — the clause/pattern/expression surface of the reference grammar
  * (/root/reference/src/backend/parser/cypher_gram.y; clause list in
  * /root/reference/src/include/nodes/cypher_nodes.h). Only WHAT the grammar
  * accepts is mirrored; the tree shapes are our own.
  */
object Ast {

  // ----------------------------------------------------------------- queries

  /** A full query: one or more clause chains combined by set operators. */
  sealed trait Query
  final case class SingleQuery(clauses: List[Clause]) extends Query
  final case class SetOp(op: String, all: Boolean, left: Query, right: Query) extends Query

  // ----------------------------------------------------------------- clauses

  sealed trait Clause
  final case class Match(patterns: List[PathPattern], optional: Boolean,
      where: Option[Expr]) extends Clause
  final case class Unwind(expr: Expr, alias: String) extends Clause
  final case class With(items: List[ReturnItem], distinct: Boolean,
      where: Option[Expr], orderBy: List[SortItem], skip: Option[Expr],
      limit: Option[Expr], group: Option[GroupSpec] = None,
      windows: Map[String, WindowDef] = Map.empty) extends Clause
  final case class Return(items: List[ReturnItem], distinct: Boolean,
      orderBy: List[SortItem], skip: Option[Expr], limit: Option[Expr],
      group: Option[GroupSpec] = None,
      windows: Map[String, WindowDef] = Map.empty) extends Clause

  /** Explicit `GROUP BY [ROLLUP|CUBE|GROUPING SETS|item, …] [HAVING pred]`
    * — the reference's unified grammar extends RETURN/WITH with PG grouping
    * (old regress aggregation.sql:540-710; cypher_gram.y:4414-4491
    * group_by_item). kind: "" plain, "rollup", "cube", or "sets" with
    * `sets` holding the fully-desugared grouping sets (each a subset of
    * `keys`; mixed items are cross-product-concatenated per PG semantics).
    */
  final case class GroupSpec(kind: String, keys: List[Expr], having: Option[Expr],
      sets: List[List[Expr]] = Nil)

  /** `OVER (PARTITION BY … ORDER BY … [ROWS|RANGE BETWEEN …])` — frame is
    * (isRows, lo, hi) with Spark-signed bounds: None = UNBOUNDED (preceding
    * for lo, following for hi); Some(v): v<0 = |v| PRECEDING, 0 = CURRENT
    * ROW, v>0 = v FOLLOWING. */
  final case class WindowDef(partitionBy: List[Expr], orderBy: List[SortItem],
      frame: Option[(Boolean, Option[Long], Option[Long])])
  final case class Create(patterns: List[PathPattern]) extends Clause
  final case class Merge(pattern: PathPattern) extends Clause
  final case class SetClause(items: List[SetItem]) extends Clause
  final case class Remove(items: List[(String, String)]) extends Clause // (variable, key)
  final case class Delete(exprs: List[Expr], detach: Boolean) extends Clause
  /** `CALL { <subquery> }` — reference: transform_cypher_call,
    * cypher_clause.c:331-432. */
  final case class CallSubquery(query: SingleQuery) extends Clause
  /** `CALL ns.fn(args) YIELD cols` — procedure-style table function. */
  final case class CallProc(name: String, args: List[Expr],
      yields: List[String], srf: Boolean = false,
      where: Option[Expr] = None) extends Clause

  final case class ReturnItem(expr: Expr, alias: Option[String])
  final case class SortItem(expr: Expr, descending: Boolean, nullsFirst: Option[Boolean])
  final case class SetItem(variable: String, key: String, value: Expr)

  // ---------------------------------------------------------------- patterns

  /** `p = (a)-[e:T*1..3]->(b)` — alternating node/rel elements. */
  final case class PathPattern(variable: Option[String], elements: List[PatternElem])
  sealed trait PatternElem
  final case class NodePattern(variable: Option[String], labels: List[String],
      props: Map[String, Expr]) extends PatternElem
  /** dir: 1 = ->, -1 = <-, 0 = undirected. varLength: Some((lo, hiOpt)). */
  final case class RelPattern(variable: Option[String], types: List[String],
      props: Map[String, Expr], dir: Int,
      varLength: Option[(Int, Option[Int])]) extends PatternElem

  // ------------------------------------------------------------- expressions

  sealed trait Expr
  final case class Lit(v: GValue) extends Expr
  final case class Var(name: String) extends Expr
  final case class Prop(base: Expr, key: String) extends Expr
  final case class Param(name: String) extends Expr
  final case class ListLit(items: List[Expr]) extends Expr
  final case class MapLit(entries: List[(String, Expr)]) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr // + - * / % ^ = <> < <= > >= AND OR XOR IN
  final case class Un(op: String, e: Expr) extends Expr // NOT, NEG
  final case class IsNull(e: Expr, not: Boolean) extends Expr
  final case class StringOp(op: String, l: Expr, r: Expr) extends Expr // STARTS/ENDS/CONTAINS/REGEX
  final case class FnCall(name: String, args: List[Expr], distinct: Boolean) extends Expr
  final case class CountStar() extends Expr
  final case class CaseExpr(operand: Option[Expr], whens: List[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  final case class Index(base: Expr, idx: Expr) extends Expr
  final case class Slice(base: Expr, lo: Option[Expr], hi: Option[Expr]) extends Expr
  final case class ExistsPattern(pattern: PathPattern) extends Expr
  /** `EXISTS(MATCH ... RETURN ...)` — full-subquery existence
    * (reference: CSP_EXISTS, cypher_nodes.h:33-46). */
  final case class ExistsSubquery(query: SingleQuery) extends Expr
  /** `expr op ANY/SOME/ALL (MATCH ... RETURN item)` — SQL sublink semantics
    * (reference: ANY_SUBLINK/ALL_SUBLINK, cypher_gram.y:2551-2553). */
  final case class SubLink(op: String, kind: String, left: Expr,
      query: SingleQuery) extends Expr
  final case class ListComp(variable: String, source: Expr, where: Option[Expr],
      projection: Option[Expr]) extends Expr
  /** Internal marker: a boolean column pre-materialized by the compiler's
    * sublink binding (Compiler.bindSublinks) — never produced by the parser.
    */
  final case class BoolCol(name: String) extends Expr
  /** `fn(args) OVER (def)` / `fn(args) OVER w` (window name resolved from
    * the clause's WINDOW list at compile). */
  final case class WindowCall(fn: Expr, over: Either[String, WindowDef]) extends Expr
  /** `agg(args) FILTER (WHERE pred)` — PG aggregate filter. */
  final case class AggFilter(agg: Expr, pred: Expr) extends Expr
  /** `fn(args) WITHIN GROUP (ORDER BY …)` — hypothetical-set rank family. */
  final case class WithinGroup(fn: String, args: List[Expr],
      order: List[SortItem]) extends Expr
}
