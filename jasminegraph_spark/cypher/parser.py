"""Recursive-descent Cypher parser for the executable subset.

Replaces the reference's ANTLR CypherLexer/CypherParser + ASTBuilder
(src/query/processor/cypher/astbuilder/, ~1430 LoC) for the planned subset
(QueryPlanner.cpp:21-466) plus the extras Spark makes cheap:

  MATCH (a:L {k:'v'})-[r:T]->(b), (c) ... WHERE <bool expr>
  RETURN [DISTINCT] items [ORDER BY ...] [SKIP n] [LIMIT n]

Expressions: comparisons (=, <>, <, >, <=, >=), STARTS WITH / ENDS WITH /
CONTAINS / IN [...], IS [NOT] NULL, AND/OR/XOR/NOT, n.prop, id(n),
string/number/bool/null literals.
"""

from __future__ import annotations

import re

from jasminegraph_spark.cypher.ast import (
    Aggregate,
    BinaryOp,
    BoolExpr,
    Comparison,
    IdFunc,
    LabelsFunc,
    PathFunc,
    ScalarFunc,
    TypeFunc,
    Literal,
    NodePattern,
    NullCheck,
    OrderItem,
    PathPattern,
    PropRef,
    Query,
    RelPattern,
    ReturnItem,
    VarRef,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<NUMBER>-?\d+\.\d+|-?\d+)
  | (?P<STRING>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ARROW_OUT>-\[|\]->|-->|<--)
  | (?P<OP>=~|<>|<=|>=|=|<|>)
  | (?P<PUNCT>[(){}\[\],.:|*\]+/%])
  | (?P<DASH>-)
  | (?P<WORD>[A-Za-z_][A-Za-z0-9_]*)
""",
    re.VERBOSE,
)

_KEYWORDS = {
    "MATCH", "CREATE", "WHERE", "RETURN", "DISTINCT", "ORDER", "BY", "ASC", "ASCENDING",
    "DESC", "DESCENDING", "SKIP", "LIMIT", "AND", "OR", "XOR", "NOT", "IS",
    "NULL", "TRUE", "FALSE", "AS", "STARTS", "ENDS", "WITH", "CONTAINS", "IN",
    "OPTIONAL", "UNWIND", "SET", "REMOVE", "DELETE", "DETACH", "MERGE", "CASE", "WHEN", "THEN", "ELSE", "END",
    "CALL", "YIELD", "UNION", "ALL", "ON",
}

_AGG_FUNCS = {"AVG", "COUNT", "SUM", "MIN", "MAX", "COLLECT"}

# whitelisted scalar functions (lowercased); each maps 1:1 to a Catalyst
# built-in in the compiler — anything else is a compile error, not a UDF
_SCALAR_FUNCS = {
    "toupper", "tolower", "tostring", "tointeger", "tofloat",
    "substring", "size", "coalesce", "abs", "round", "ceil", "floor",
    "sqrt", "sign", "trim", "ltrim", "rtrim", "replace", "split",
    "reverse", "left", "right", "keys", "properties",
}


class CypherSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CypherSyntaxError(f"unexpected character {text[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        val = m.group()
        if kind == "WORD" and val.upper() in _KEYWORDS:
            out.append(("KW", val))  # original case kept; matched upper
        else:
            out.append((kind, val))
    out.append(("EOF", ""))
    return out


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, k: int = 0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        k, v = self.peek()
        cmp = v.upper() if kind == "KW" else v
        if k == kind and (val is None or cmp == val):
            self.i += 1
            return v
        return None

    def name(self) -> str:
        """An identifier position where keywords are allowed (labels,
        relationship types, property keys, aliases) — e.g. a label named
        'Order' must not collide with the ORDER keyword."""
        k, v = self.peek()
        if k in ("WORD", "KW"):
            self.i += 1
            return v
        raise CypherSyntaxError(f"expected identifier, got {v!r}")

    def expect(self, kind, val=None):
        got = self.accept(kind, val)
        if got is None:
            k, v = self.peek()
            raise CypherSyntaxError(f"expected {val or kind}, got {v!r}")
        return got

    # -- grammar ------------------------------------------------------------
    def parse_query(self) -> Query:
        from jasminegraph_spark.cypher.ast import MatchClause, UnwindClause, WithClause

        q = Query()
        if self.accept("KW", "CREATE"):
            # CREATE clause: literal patterns only, no WHERE/RETURN needed
            q.is_create = True
            mc = MatchClause()
            mc.patterns.append(self.parse_path())
            while self.accept("PUNCT", ","):
                mc.patterns.append(self.parse_path())
            q.clauses.append(mc)
            self.expect("EOF")
            return q
        # reading clauses: (OPTIONAL MATCH | MATCH | WITH | UNWIND)*
        while True:
            if self.accept("KW", "OPTIONAL"):
                self.expect("KW", "MATCH")
                q.clauses.append(self._parse_match_clause(optional=True))
            elif self.accept("KW", "MATCH"):
                q.clauses.append(self._parse_match_clause(optional=False))
            elif self.accept("KW", "UNWIND"):
                expr = self._parse_list_or_value()
                self.expect("KW", "AS")
                q.clauses.append(UnwindClause(expr=expr, var=self.name()))
            elif self.accept("KW", "CALL"):
                from jasminegraph_spark.cypher.ast import CallClause

                pname = self.name()
                while self.accept("PUNCT", "."):
                    pname += "." + self.name()
                self.expect("PUNCT", "(")
                args = []
                if self.peek() != ("PUNCT", ")"):
                    args.append(self.parse_literal().value)
                    while self.accept("PUNCT", ","):
                        args.append(self.parse_literal().value)
                self.expect("PUNCT", ")")
                cc = CallClause(proc=pname, args=args)
                if self.accept("KW", "YIELD"):
                    cc.yields.append(self.name())
                    while self.accept("PUNCT", ","):
                        cc.yields.append(self.name())
                    if self.accept("KW", "WHERE"):
                        cc.where = self.parse_or()
                q.clauses.append(cc)
            elif self.accept("KW", "WITH"):
                wc = WithClause()
                if self.accept("KW", "DISTINCT"):
                    wc.distinct = True
                wc.items.append(self.parse_return_item())
                while self.accept("PUNCT", ","):
                    wc.items.append(self.parse_return_item())
                if self.accept("KW", "ORDER"):
                    self.expect("KW", "BY")
                    wc.order_by.append(self.parse_order_item())
                    while self.accept("PUNCT", ","):
                        wc.order_by.append(self.parse_order_item())
                if self.accept("KW", "SKIP"):
                    wc.skip = int(self.expect("NUMBER"))
                if self.accept("KW", "LIMIT"):
                    wc.limit = int(self.expect("NUMBER"))
                if self.accept("KW", "WHERE"):
                    wc.where = self.parse_or()
                q.clauses.append(wc)
            else:
                break
        # write clauses (SET / [DETACH] DELETE / CREATE after MATCH;
        # MERGE standalone)
        if self.accept("KW", "MERGE"):
            from jasminegraph_spark.cypher.ast import MergeClause, SetItem

            mc = MergeClause(pattern=self.parse_path())
            # ON CREATE SET / ON MATCH SET conditional property writes
            while self.accept("KW", "ON"):
                created = bool(self.accept("KW", "CREATE"))
                if not created:
                    self.expect("KW", "MATCH")
                self.expect("KW", "SET")
                items = []
                while True:
                    var = self.expect("WORD")
                    self.expect("PUNCT", ".")
                    key = self.name()
                    self.expect("OP", "=")
                    items.append(SetItem(var, key, self.parse_literal().value))
                    if not self.accept("PUNCT", ","):
                        break
                (mc.on_create if created else mc.on_match).extend(items)
            q.write_clause = mc
            self.expect("EOF")
            return q
        if q.clauses and self.accept("KW", "CREATE"):
            from jasminegraph_spark.cypher.ast import CreateRelClause

            q.write_clause = CreateRelClause(pattern=self.parse_path())
            self.expect("EOF")
            return q
        if self.accept("KW", "SET"):
            from jasminegraph_spark.cypher.ast import SetClause, SetItem, SetLabelItem

            sc = SetClause()
            while True:
                var = self.expect("WORD")
                if self.accept("PUNCT", ":"):
                    sc.items.append(SetLabelItem(var, self.name()))
                else:
                    self.expect("PUNCT", ".")
                    key = self.name()
                    self.expect("OP", "=")
                    sc.items.append(SetItem(var, key, self.parse_literal().value))
                if not self.accept("PUNCT", ","):
                    break
            q.write_clause = sc
            self.expect("EOF")
            return q
        if self.accept("KW", "REMOVE"):
            from jasminegraph_spark.cypher.ast import RemoveClause, RemoveItem

            rc = RemoveClause()
            while True:
                var = self.expect("WORD")
                if self.accept("PUNCT", ":"):
                    rc.items.append(RemoveItem(var, label=self.name()))
                else:
                    self.expect("PUNCT", ".")
                    rc.items.append(RemoveItem(var, key=self.name()))
                if not self.accept("PUNCT", ","):
                    break
            q.write_clause = rc
            self.expect("EOF")
            return q
        detach = bool(self.accept("KW", "DETACH"))
        if detach or self.peek()[:1] == ("KW",) and self.peek()[1].upper() == "DELETE":
            from jasminegraph_spark.cypher.ast import DeleteClause

            self.expect("KW", "DELETE")
            dc = DeleteClause(detach=detach)
            dc.vars.append(self.expect("WORD"))
            while self.accept("PUNCT", ","):
                dc.vars.append(self.expect("WORD"))
            q.write_clause = dc
            self.expect("EOF")
            return q
        if not q.clauses:
            raise CypherSyntaxError("query must start with MATCH/UNWIND")
        self.expect("KW", "RETURN")
        if self.accept("KW", "DISTINCT"):
            q.distinct = True
        q.return_items.append(self.parse_return_item())
        while self.accept("PUNCT", ","):
            q.return_items.append(self.parse_return_item())
        if self.accept("KW", "ORDER"):
            self.expect("KW", "BY")
            q.order_by.append(self.parse_order_item())
            while self.accept("PUNCT", ","):
                q.order_by.append(self.parse_order_item())
        if self.accept("KW", "SKIP"):
            q.skip = int(self.expect("NUMBER"))
        if self.accept("KW", "LIMIT"):
            q.limit = int(self.expect("NUMBER"))
        if self.accept("KW", "UNION"):
            all_flag = bool(self.accept("KW", "ALL"))
            q.union_with.append((all_flag, self.parse_query()))
            return q  # the recursive parse consumed EOF
        self.expect("EOF")
        return q

    def _parse_match_clause(self, optional: bool):
        from jasminegraph_spark.cypher.ast import MatchClause

        mc = MatchClause(optional=optional)
        mc.patterns.append(self.parse_path())
        while self.accept("PUNCT", ","):
            mc.patterns.append(self.parse_path())
        if self.accept("KW", "WHERE"):
            mc.where = self.parse_or()
        return mc

    def _parse_list_or_value(self):
        # list literals and comprehensions are both handled by parse_primary
        return self.parse_value()

    def parse_path(self) -> PathPattern:
        p = PathPattern()
        # optional path binding: `p = (...)...` ('=' lexes as OP)
        k, v = self.peek()
        if k == "WORD" and self.peek(1) == ("OP", "="):
            self.next()
            self.next()
            p.path_var = v
        k, v = self.peek()
        if k == "WORD" and v.lower() == "shortestpath" and self.peek(1) == ("PUNCT", "("):
            self.next()
            self.expect("PUNCT", "(")
            p.shortest = True
            p.nodes.append(self.parse_node())
            while True:
                rel = self.try_parse_rel()
                if rel is None:
                    break
                p.rels.append(rel)
                p.nodes.append(self.parse_node())
            self.expect("PUNCT", ")")
            return p
        p.nodes.append(self.parse_node())
        while True:
            rel = self.try_parse_rel()
            if rel is None:
                break
            p.rels.append(rel)
            p.nodes.append(self.parse_node())
        return p

    def parse_node(self) -> NodePattern:
        self.expect("PUNCT", "(")
        var = None
        k, v = self.peek()
        if k == "WORD":
            var = self.next()[1]
        labels = []
        while self.accept("PUNCT", ":"):
            labels.append(self.name())
        props = self.parse_prop_map() if self.peek() == ("PUNCT", "{") else {}
        self.expect("PUNCT", ")")
        return NodePattern(var=var, labels=labels, props=props)

    def parse_prop_map(self) -> dict:
        self.expect("PUNCT", "{")
        props = {}
        while True:
            key = self.name()
            self.expect("PUNCT", ":")
            props[key] = self.parse_literal().value
            if not self.accept("PUNCT", ","):
                break
        self.expect("PUNCT", "}")
        return props

    def try_parse_rel(self) -> RelPattern | None:
        k, v = self.peek()
        # <-[r:T]-   |   -[r:T]->   |   -[r:T]-   |   -->   |   <--
        if (k, v) == ("ARROW_OUT", "-->"):
            self.next()
            return RelPattern(var=None, direction="out")
        if (k, v) == ("ARROW_OUT", "<--"):
            self.next()
            return RelPattern(var=None, direction="in")
        incoming = False
        j = self.i
        if (k, v) == ("OP", "<"):
            # '<' then '-[' : incoming
            if self.peek(1) == ("ARROW_OUT", "-["):
                self.next()
                incoming = True
            else:
                return None
        k, v = self.peek()
        if (k, v) == ("ARROW_OUT", "-["):
            self.next()
            var = None
            if self.peek()[0] == "WORD":
                var = self.next()[1]
            types = []
            if self.accept("PUNCT", ":"):
                types.append(self.name())
                while self.accept("PUNCT", "|"):
                    self.accept("PUNCT", ":")
                    types.append(self.name())
            min_hops = max_hops = None
            if self.accept("PUNCT", "*"):
                min_hops, max_hops = 1, 3  # bare '*' default bound
                if self.peek()[0] == "NUMBER":
                    min_hops = int(self.next()[1])
                    max_hops = min_hops
                    if self.accept("PUNCT", ".") and self.expect("PUNCT", "."):
                        max_hops = int(self.expect("NUMBER"))
            props = self.parse_prop_map() if self.peek() == ("PUNCT", "{") else {}
            # closing: ']->' or ']-' (PUNCT ] then DASH)
            if self.accept("ARROW_OUT", "]->"):
                if incoming:
                    raise CypherSyntaxError("<-[...]-> is not a valid relationship")
                return RelPattern(var=var, types=types, direction="out", props=props,
                                  min_hops=min_hops, max_hops=max_hops)
            self.expect("PUNCT", "]")
            self.expect("DASH")
            if not incoming and self.accept("OP", ">"):
                return RelPattern(var=var, types=types, direction="out", props=props,
                                  min_hops=min_hops, max_hops=max_hops)
            return RelPattern(
                var=var, types=types, direction="in" if incoming else "both", props=props,
                min_hops=min_hops, max_hops=max_hops
            )
        if (k, v) == ("DASH", "-"):
            # bare '-' ... '-' undirected with no bracket, or '-('? Cypher
            # requires '--' for anonymous undirected; treat single '-' + '('
            nxt = self.peek(1)
            if nxt == ("DASH", "-") or nxt == ("PUNCT", "("):
                self.next()
                self.accept("DASH")
                return RelPattern(var=None, direction="both")
        self.i = j
        return None

    # -- expressions --------------------------------------------------------
    def parse_or(self):
        left = self.parse_xor()
        ops = [left]
        while self.accept("KW", "OR"):
            ops.append(self.parse_xor())
        return ops[0] if len(ops) == 1 else BoolExpr("OR", ops)

    def parse_xor(self):
        ops = [self.parse_and()]
        while self.accept("KW", "XOR"):
            ops.append(self.parse_and())
        return ops[0] if len(ops) == 1 else BoolExpr("XOR", ops)

    def parse_and(self):
        ops = [self.parse_not()]
        while self.accept("KW", "AND"):
            ops.append(self.parse_not())
        return ops[0] if len(ops) == 1 else BoolExpr("AND", ops)

    def parse_not(self):
        if self.accept("KW", "NOT"):
            return BoolExpr("NOT", [self.parse_not()])
        return self.parse_comparison()

    def parse_comparison(self):
        from jasminegraph_spark.cypher.ast import ExistsPattern, ListPredicate

        k, v = self.peek()
        if (
            k in ("WORD", "KW")  # ALL lexes as KW (UNION ALL) but is also
            # the list predicate all(x IN ... WHERE ...)
            and v.lower() in ("any", "all", "none", "single")
            and self.peek(1) == ("PUNCT", "(")
        ):
            func = self.next()[1].lower()
            self.expect("PUNCT", "(")
            lvar = self.expect("WORD")
            self.expect("KW", "IN")
            lst = self.parse_value()
            self.expect("KW", "WHERE")
            pred = self.parse_or()
            self.expect("PUNCT", ")")
            return ListPredicate(func, lvar, lst, pred)
        if k == "WORD" and v.lower() == "exists" and self.peek(1) == ("PUNCT", "("):
            self.next()
            self.expect("PUNCT", "(")
            pat = self.parse_path()
            self.expect("PUNCT", ")")
            return ExistsPattern(pattern=pat)
        if self.accept("PUNCT", "("):
            inner = self.parse_or()
            self.expect("PUNCT", ")")
            return inner
        left = self.parse_value()
        k, v = self.peek()
        if k == "OP":
            op = self.next()[1]
            op = {"=": "=="}.get(op, op)
            return Comparison(left, op, self.parse_value())
        v = v.upper() if k == "KW" else v
        if (k, v) == ("KW", "IS"):
            self.next()
            negate = bool(self.accept("KW", "NOT"))
            self.expect("KW", "NULL")
            return NullCheck(left, is_null=not negate)
        if (k, v) == ("KW", "STARTS"):
            self.next()
            self.expect("KW", "WITH")
            return Comparison(left, "STARTS_WITH", self.parse_value())
        if (k, v) == ("KW", "ENDS"):
            self.next()
            self.expect("KW", "WITH")
            return Comparison(left, "ENDS_WITH", self.parse_value())
        if (k, v) == ("KW", "CONTAINS"):
            self.next()
            return Comparison(left, "CONTAINS", self.parse_value())
        if (k, v) == ("KW", "IN"):
            self.next()
            self.expect("PUNCT", "[")
            vals = [self.parse_literal().value]
            while self.accept("PUNCT", ","):
                vals.append(self.parse_literal().value)
            self.expect("PUNCT", "]")
            return Comparison(left, "IN", Literal(vals))
        # bare value in boolean context (e.g. boolean property)
        return left

    def parse_value(self):
        """additive := multiplicative (('+'|'-') multiplicative)*"""
        left = self.parse_multiplicative()
        while True:
            if self.accept("PUNCT", "+"):
                left = BinaryOp("+", left, self.parse_multiplicative())
            elif self.peek() == ("DASH", "-"):
                self.next()
                left = BinaryOp("-", left, self.parse_multiplicative())
            else:
                return left

    def parse_multiplicative(self):
        left = self.parse_primary()
        while True:
            if self.accept("PUNCT", "*"):
                left = BinaryOp("*", left, self.parse_primary())
            elif self.accept("PUNCT", "/"):
                left = BinaryOp("/", left, self.parse_primary())
            elif self.accept("PUNCT", "%"):
                left = BinaryOp("%", left, self.parse_primary())
            else:
                return left

    def parse_primary(self):
        if self.peek() == ("PUNCT", "["):
            from jasminegraph_spark.cypher.ast import ListComprehension

            # pattern comprehension [(a)-[:T]->(b) WHERE ... | expr]
            if self.peek(1) == ("PUNCT", "("):
                from jasminegraph_spark.cypher.ast import PatternComprehension

                self.next()
                pat = self.parse_path()
                where = None
                if self.accept("KW", "WHERE"):
                    where = self.parse_or()
                self.expect("PUNCT", "|")
                map_expr = self.parse_value()
                self.expect("PUNCT", "]")
                return PatternComprehension(pat, where, map_expr)
            # comprehension [x IN list ...] vs literal list [1, 2, 3]
            if (
                self.peek(1)[0] == "WORD"
                and self.peek(2)[0] == "KW"
                and self.peek(2)[1].upper() == "IN"
            ):
                self.next()
                lvar = self.expect("WORD")
                self.expect("KW", "IN")
                lst = self.parse_value()
                where = None
                if self.accept("KW", "WHERE"):
                    where = self.parse_or()
                map_expr = None
                if self.accept("PUNCT", "|"):
                    map_expr = self.parse_value()
                self.expect("PUNCT", "]")
                return ListComprehension(lvar, lst, where, map_expr)
            self.next()
            vals = [self.parse_literal().value]
            while self.accept("PUNCT", ","):
                vals.append(self.parse_literal().value)
            self.expect("PUNCT", "]")
            return Literal(vals)
        if self.accept("KW", "CASE"):
            from jasminegraph_spark.cypher.ast import CaseExpr

            ce = CaseExpr()
            while self.accept("KW", "WHEN"):
                pred = self.parse_or()
                self.expect("KW", "THEN")
                ce.whens.append((pred, self.parse_value()))
            if self.accept("KW", "ELSE"):
                ce.else_ = self.parse_value()
            self.expect("KW", "END")
            if not ce.whens:
                raise CypherSyntaxError("CASE requires at least one WHEN")
            return ce
        if self.accept("PUNCT", "("):
            inner = self.parse_value()
            self.expect("PUNCT", ")")
            return inner
        k, v = self.peek()
        if k == "WORD":
            word = self.next()[1]
            if word == "id" and self.peek() == ("PUNCT", "("):
                self.next()
                var = self.expect("WORD")
                self.expect("PUNCT", ")")
                return IdFunc(var)
            if word == "labels" and self.peek() == ("PUNCT", "("):
                self.next()
                var = self.expect("WORD")
                self.expect("PUNCT", ")")
                return LabelsFunc(var)
            if word == "type" and self.peek() == ("PUNCT", "("):
                self.next()
                var = self.expect("WORD")
                self.expect("PUNCT", ")")
                return TypeFunc(var)
            if word in ("length", "nodes") and self.peek() == ("PUNCT", "("):
                self.next()
                var = self.expect("WORD")
                self.expect("PUNCT", ")")
                return PathFunc(word, var)
            if word == "reduce" and self.peek() == ("PUNCT", "("):
                from jasminegraph_spark.cypher.ast import Reduce

                self.next()
                acc = self.expect("WORD")
                self.expect("OP", "=")
                init = self.parse_value()
                self.expect("PUNCT", ",")
                lvar = self.expect("WORD")
                self.expect("KW", "IN")
                lst = self.parse_value()
                self.expect("PUNCT", "|")
                body = self.parse_value()
                self.expect("PUNCT", ")")
                return Reduce(acc, init, lvar, lst, body)
            if word in ("keys", "properties") and self.peek() == ("PUNCT", "("):
                self.next()
                var = self.expect("WORD")
                self.expect("PUNCT", ")")
                return ScalarFunc(word, [VarRef(var)])
            if word.lower() in _SCALAR_FUNCS and self.peek() == ("PUNCT", "("):
                self.next()
                args = []
                if self.peek() != ("PUNCT", ")"):
                    args.append(self.parse_value())
                    while self.accept("PUNCT", ","):
                        args.append(self.parse_value())
                self.expect("PUNCT", ")")
                return ScalarFunc(word.lower(), args)
            if self.accept("PUNCT", "."):
                return PropRef(word, self.name())
            return VarRef(word)
        return self.parse_literal()

    def parse_literal(self) -> Literal:
        k, v = self.peek()
        if k == "NUMBER":
            self.next()
            return Literal(float(v) if "." in v else int(v))
        if k == "STRING":
            self.next()
            return Literal(v[1:-1].replace("\\'", "'").replace('\\"', '"'))
        if (k, v) == ("KW", "TRUE"):
            self.next()
            return Literal(True)
        if (k, v) == ("KW", "FALSE"):
            self.next()
            return Literal(False)
        if (k, v) == ("KW", "NULL"):
            self.next()
            return Literal(None)
        raise CypherSyntaxError(f"expected literal, got {v!r}")

    # -- return -------------------------------------------------------------
    def parse_return_item(self) -> ReturnItem:
        expr = self.parse_return_expr()
        alias = None
        if self.accept("KW", "AS"):
            alias = self.name()
        return ReturnItem(expr, alias)

    def parse_return_expr(self):
        k, v = self.peek()
        if k == "WORD" and v.upper() in _AGG_FUNCS and self.peek(1) == ("PUNCT", "("):
            func = self.next()[1].lower()
            self.expect("PUNCT", "(")
            distinct = bool(self.accept("KW", "DISTINCT"))
            if func == "count" and self.accept("PUNCT", "*"):
                inner = None
            elif func == "count" and self.peek() == ("PUNCT", ")"):
                inner = None
            else:
                inner = None if self.peek() == ("PUNCT", ")") else self.parse_value()
            self.expect("PUNCT", ")")
            return Aggregate(func, inner, distinct)
        return self.parse_value()

    def parse_order_item(self) -> OrderItem:
        expr = self.parse_value()
        asc = True
        if self.accept("KW", "DESC") or self.accept("KW", "DESCENDING"):
            asc = False
        else:
            self.accept("KW", "ASC") or self.accept("KW", "ASCENDING")
        return OrderItem(expr, asc)


def parse(text: str) -> Query:
    return _Parser(text.strip().rstrip(";")).parse_query()
