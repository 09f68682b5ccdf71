"""Cypher AST node types (dataclasses).

Covers the executable surface of the reference's grammar — the reference
parses full openCypher via ANTLR (astbuilder/ASTBuilder.cpp, 1430 LoC) but
only *plans* the subset in queryplanner/QueryPlanner.cpp:21-466; we model
that subset plus the easy extensions Spark gives nearly free (aggregates
beyond avg, SKIP/LIMIT, string predicates, arithmetic comparisons).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class NodePattern:
    var: str | None
    labels: list[str] = field(default_factory=list)
    props: dict = field(default_factory=dict)


@dataclass
class RelPattern:
    var: str | None
    types: list[str] = field(default_factory=list)
    direction: str = "both"  # 'out' | 'in' | 'both'
    props: dict = field(default_factory=dict)
    min_hops: int | None = None  # variable-length: -[:T*min..max]-
    max_hops: int | None = None


@dataclass
class PathPattern:
    """node (rel node)* chain; ``path_var`` binds the whole path
    (``MATCH p = (...)-[...]-(...)``) for length()/nodes()."""

    nodes: list[NodePattern] = field(default_factory=list)
    rels: list[RelPattern] = field(default_factory=list)
    path_var: str | None = None
    shortest: bool = False  # shortestPath((...)-[*..n]-(...)) wrapper


# --- expressions -----------------------------------------------------------


@dataclass
class PropRef:
    var: str
    key: str


@dataclass
class IdFunc:
    var: str


@dataclass
class LabelsFunc:
    """labels(n) — single-label data model, so this yields the label
    string (the reference likewise stores one label per node,
    NodeBlock.h:33-48)."""

    var: str


@dataclass
class PathFunc:
    """length(p) — relationship count of the bound path; nodes(p) — node
    id sequence (fixed-length patterns only; a variable-length path's
    interior nodes differ per row)."""

    func: str  # "length" | "nodes"
    var: str


@dataclass
class TypeFunc:
    """type(r) — the relationship type string (RelationBlock type in the
    reference's store)."""

    var: str


@dataclass
class ScalarFunc:
    """Whitelisted openCypher scalar function call over value expressions
    (toUpper/substring/coalesce/abs/...). Args are value expressions;
    compilation maps 1:1 onto Catalyst built-ins (no UDFs)."""

    func: str
    args: list


@dataclass
class VarRef:
    var: str


@dataclass
class Literal:
    value: object


@dataclass
class CaseExpr:
    """Generic CASE WHEN <pred> THEN <val> ... [ELSE <val>] END."""

    whens: list = field(default_factory=list)  # [(predicate, value)]
    else_: object = None


@dataclass
class BinaryOp:
    """Arithmetic: + - * / % (grammar-recognized but unplanned in the
    reference — QueryPlanner TODO branches; live here)."""

    op: str
    left: object = None
    right: object = None


@dataclass
class Comparison:
    left: object
    op: str  # == <> < > <= >= STARTS_WITH ENDS_WITH CONTAINS IN
    right: object


@dataclass
class ExistsPattern:
    """EXISTS((n)-[:T]->(m)) pattern predicate — compiles to a semi-join
    (anti-join under NOT) against the bound anchor variable."""

    pattern: object = None  # PathPattern
    negated: bool = False


@dataclass
class NullCheck:
    expr: object
    is_null: bool


@dataclass
class BoolExpr:
    op: str  # AND OR XOR NOT
    operands: list = field(default_factory=list)


@dataclass
class Aggregate:
    func: str  # avg count sum min max collect
    expr: object  # None for count(*)
    distinct: bool = False


@dataclass
class ListPredicate:
    """ANY/ALL/NONE/SINGLE (x IN list WHERE pred) — the grammar's list
    predicates (reference AST recognizes them, planner never did —
    SURVEY §2.1 'unimplemented surface')."""

    func: str  # any all none single
    var: str
    list_expr: object
    where: object


@dataclass
class ListComprehension:
    """[x IN list WHERE pred | map] — filter and/or transform a list."""

    var: str
    list_expr: object
    where: object | None = None
    map_expr: object | None = None


@dataclass
class PatternComprehension:
    """[(a)-[:T]->(b) WHERE pred | expr] — one list per row collecting
    ``expr`` over every match of the pattern anchored at a bound
    variable (compiled as an anchored subpattern + collect_list join;
    the list is sorted for determinism — openCypher leaves the order
    unspecified)."""

    pattern: object
    where: object | None = None
    map_expr: object | None = None


@dataclass
class Reduce:
    """reduce(acc = init, x IN list | expr) — list fold."""

    acc_var: str
    init: object
    var: str
    list_expr: object
    body: object


# --- clauses ---------------------------------------------------------------


@dataclass
class ReturnItem:
    expr: object
    alias: str | None = None


@dataclass
class OrderItem:
    expr: object
    ascending: bool = True


@dataclass
class MatchClause:
    patterns: list[PathPattern] = field(default_factory=list)
    where: object | None = None
    optional: bool = False


@dataclass
class WithClause:
    items: list[ReturnItem] = field(default_factory=list)
    distinct: bool = False
    where: object | None = None
    order_by: list[OrderItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None


@dataclass
class CallClause:
    """CALL proc(args) [YIELD cols [WHERE pred]]."""

    proc: str
    args: list = field(default_factory=list)
    yields: list = field(default_factory=list)
    where: object | None = None


@dataclass
class UnwindClause:
    expr: object = None  # Literal list (or list-valued expression)
    var: str = "x"


@dataclass
class SetItem:
    var: str
    key: str
    value: object


@dataclass
class SetLabelItem:
    """SET n:Label — single-label graph model, so this RELABELS the node
    (openCypher adds to a label set; documented divergence)."""

    var: str
    label: str


@dataclass
class SetClause:
    items: list = field(default_factory=list)  # SetItem | SetLabelItem


@dataclass
class RemoveItem:
    var: str
    key: str | None = None  # REMOVE n.prop
    label: str | None = None  # REMOVE n:Label (label → NULL when it matches)


@dataclass
class RemoveClause:
    items: list = field(default_factory=list)


@dataclass
class DeleteClause:
    vars: list = field(default_factory=list)
    detach: bool = False


@dataclass
class MergeClause:
    pattern: object = None  # single-node or (a)-[:T]->(b) PathPattern
    # ON CREATE SET / ON MATCH SET property writes (SetItem lists);
    # supported on the single-node form — the conditional-upsert idiom
    on_create: list = field(default_factory=list)
    on_match: list = field(default_factory=list)


@dataclass
class CreateRelClause:
    """MATCH-bound relationship creation: MATCH ... CREATE (a)-[:T]->(b)
    where a and b are node variables bound by the MATCH part."""

    pattern: object = None  # 2-node / 1-rel PathPattern


@dataclass
class Query:
    clauses: list = field(default_factory=list)  # Match/With/Unwind clauses
    is_create: bool = False
    write_clause: object | None = None  # SetClause | DeleteClause | MergeClause
    return_items: list[ReturnItem] = field(default_factory=list)
    distinct: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    # UNION [ALL] chaining: [(all_flag, Query), ...] appended in text order
    union_with: list = field(default_factory=list)

    # -- compatibility accessors (pre-WITH single-MATCH shape) -------------
    @property
    def patterns(self) -> list[PathPattern]:
        return [p for c in self.clauses if isinstance(c, MatchClause) for p in c.patterns]

    @property
    def where(self):
        for c in self.clauses:
            if isinstance(c, MatchClause) and c.where is not None:
                return c.where
        return None
