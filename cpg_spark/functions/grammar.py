"""Context-free grammar machinery for the string-property chain:
SCC detection, recursion typing, Mohri-Nederhof regular approximation,
and regex synthesis for strongly regular grammars.

Pure Python on purpose: a hotspot's grammar is small (the reference
computes per-hotspot automata locally for the same reason), so this runs
inside a grouped-map pandas UDF — the parallelism unit is the hotspot,
not the production. The distributed side (building the productions table
from DFG slices) stays in DataFrame land (operators/stringapprox.py).

Reference parity:
  * SCC + Recursion typing — cpg-analysis helper/Components.kt:79-131
  * RegularApproximation (primed nonterminals A', per-production cases)
    — helper/approximations/RegularApproximation.kt:45-174
  * regex synthesis — GrammarToNFA.kt + NFA.toRegex state elimination;
    here done directly on the strongly regular grammar via per-SCC
    Arden/Gaussian elimination (mathematically the same elimination the
    NFA route performs, without materializing states).

Symbols: ("t", literal) terminals, ("n", nt_id) nonterminal references.
Productions are tuples of 0..2 symbols (the reference's normal form:
epsilon/terminal, unit, concat).
"""

from __future__ import annotations

import re

T = "t"
N = "n"

NONE, LEFT, RIGHT, BOTH = "none", "left", "right", "both"


class Grammar:
    def __init__(self) -> None:
        self.prods: dict[int, list[tuple]] = {}
        self.labels: dict[int, str] = {}
        self._next = 0

    def add_nt(self, label: str | None = None) -> int:
        nt = self._next
        self._next += 1
        self.prods[nt] = []
        self.labels[nt] = label if label is not None else f"N{nt}"
        return nt

    def add_prod(self, nt: int, symbols: tuple) -> None:
        assert len(symbols) <= 2, "normal form: at most two symbols"
        self.prods[nt].append(tuple(symbols))

    def nts(self) -> list[int]:
        return list(self.prods)

    def successors(self, nt: int) -> set[int]:
        return {
            s[1] for p in self.prods[nt] for s in p if s[0] == N
        }


def sccs(g: Grammar) -> list[list[int]]:
    """Kosaraju SCCs of the nonterminal graph, in REVERSE topological
    order (every successor component comes before its predecessors) —
    the evaluation order regex synthesis needs."""
    order: list[int] = []
    seen: set[int] = set()
    for s in g.nts():
        if s in seen:
            continue
        stack = [(s, iter(g.successors(s)))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(g.successors(w))))
                    break
            else:
                order.append(v)
                stack.pop()
    radj: dict[int, list[int]] = {}
    for u in g.nts():
        for v in g.successors(u):
            radj.setdefault(v, []).append(u)
    comp: dict[int, int] = {}
    comps: list[list[int]] = []
    for s in reversed(order):
        if s in comp:
            continue
        members = [s]
        comp[s] = len(comps)
        stack2 = [s]
        while stack2:
            v = stack2.pop()
            for w in radj.get(v, ()):
                if w not in comp:
                    comp[w] = len(comps)
                    members.append(w)
                    stack2.append(w)
        comps.append(sorted(members))
    # Kosaraju emits components in topological order; reverse it
    return list(reversed(comps))


def recursion_kind(g: Grammar, comp: set[int]) -> str:
    """Components.kt determineRecursion: LEFT if an in-component NT is
    followed by anything inside a production, RIGHT if preceded; a
    component showing both patterns is BOTH and needs approximation."""
    left = right = False
    for a in comp:
        for p in g.prods[a]:
            if len(p) == 2:
                s1, s2 = p
                if s1[0] == N and s1[1] in comp:
                    left = True
                if s2[0] == N and s2[1] in comp:
                    right = True
    if left and right:
        return BOTH
    if left:
        return LEFT
    if right:
        return RIGHT
    return NONE


def regular_approximation(g: Grammar, hotspots: set[int] | None = None) -> bool:
    """Mohri-Nederhof transformation in place: every BOTH-recursive
    component is rewritten with primed nonterminals so its recursion
    becomes purely right — the grammar's language becomes a regular
    over-approximation (superset) of the original. Returns True if any
    component was rewritten (False = grammar already strongly regular,
    identity — the reference's early return).

    Case table mirrors RegularApproximation.handleProduction:
      A -> B     (B in comp)  =>  A -> B,   B' -> A'
      A -> X     (X outside)  =>  A -> X A'
      A -> B C   (in,  in )   =>  A -> B,   B' -> C,     C' -> A'
      A -> B X   (in,  out)   =>  A -> B,   B' -> X A'
      A -> X B   (out, in )   =>  A -> X B, B' -> A'
      A -> X Y   (out, out)   =>  A -> R A',  R -> X Y
      A -> t | eps            =>  A -> R A',  R -> t | eps
    A' derives epsilon iff A is a hotspot/start or is entered from
    outside its component."""
    hotspots = set(hotspots or ())
    comps = sccs(g)
    kinds = [recursion_kind(g, set(c)) for c in comps]
    if BOTH not in kinds:
        return False

    comp_of: dict[int, int] = {}
    for i, c in enumerate(comps):
        for nt in c:
            comp_of[nt] = i

    need_eps: set[int] = set(hotspots)
    for nt in g.nts():
        for succ in g.successors(nt):
            if comp_of[nt] != comp_of[succ]:
                need_eps.add(succ)

    for ci, c in enumerate(comps):
        if kinds[ci] != BOTH:
            continue
        comp = set(c)
        old = {a: list(g.prods[a]) for a in c}
        primed: dict[int, int] = {}
        for a in c:
            g.prods[a] = []
            ap = g.add_nt(f"{g.labels[a]}'")
            primed[a] = ap
            if a in need_eps:
                g.add_prod(ap, ())
        for a in c:
            for p in old[a]:
                _mn_production(g, comp, primed, a, p)
    return True


def _in(sym: tuple, comp: set[int]) -> bool:
    return sym[0] == N and sym[1] in comp


def _mn_production(
    g: Grammar, comp: set[int], primed: dict[int, int], a: int, p: tuple
) -> None:
    ap = primed[a]
    if len(p) == 1 and _in(p[0], comp):
        b = p[0][1]
        g.add_prod(a, ((N, b),))
        g.add_prod(primed[b], ((N, ap),))
    elif len(p) == 1:
        g.add_prod(a, (p[0], (N, ap)))
    elif len(p) == 2:
        s1, s2 = p
        i1, i2 = _in(s1, comp), _in(s2, comp)
        if i1 and i2:
            b, c2 = s1[1], s2[1]
            g.add_prod(a, ((N, b),))
            g.add_prod(primed[b], ((N, c2),))
            g.add_prod(primed[c2], ((N, ap),))
        elif i1:
            b = s1[1]
            g.add_prod(a, ((N, b),))
            g.add_prod(primed[b], (s2, (N, ap)))
        elif i2:
            b = s2[1]
            g.add_prod(a, (s1, (N, b)))
            g.add_prod(primed[b], ((N, ap),))
        else:
            r = g.add_nt()
            g.add_prod(a, ((N, r), (N, ap)))
            g.add_prod(r, (s1, s2))
    else:  # epsilon
        r = g.add_nt()
        g.add_prod(a, ((N, r), (N, ap)))
        g.add_prod(r, ())


# --- regex synthesis for strongly regular grammars ---------------------------
#
# regex values: str (possibly "" = epsilon) or None = empty language.


def _alt(parts: list[str | None]) -> str | None:
    live = [p for p in parts if p is not None]
    if not live:
        return None
    uniq: list[str] = []
    for p in live:
        if p not in uniq:
            uniq.append(p)
    if "" in uniq:
        rest = [p for p in uniq if p]
        if not rest:
            return ""
        inner = rest[0] if len(rest) == 1 else "(?:" + "|".join(rest) + ")"
        return f"(?:{inner})?"
    if len(uniq) == 1:
        return uniq[0]
    return "(?:" + "|".join(uniq) + ")"


def _cat(a: str | None, b: str | None) -> str | None:
    if a is None or b is None:
        return None
    return a + b


def _star(a: str | None) -> str:
    if a is None or a == "":
        return ""
    return f"(?:{a})*"


def _needs_group(r: str) -> bool:
    return len(r) > 1 and not (
        r.startswith("(?:") and r.endswith(")") and _balanced(r)
    )


def _balanced(r: str) -> bool:
    depth = 0
    for i, ch in enumerate(r):
        if ch == "(" and (i == 0 or r[i - 1] != "\\"):
            depth += 1
        elif ch == ")" and r[i - 1] != "\\":
            depth -= 1
            if depth == 0 and i != len(r) - 1:
                return False
    return depth == 0


def _grp(r: str) -> str:
    return r if not _needs_group(r) else f"(?:{r})"


def grammar_to_regex(g: Grammar, start: int) -> str | None:
    """Regex per nonterminal for a STRONGLY REGULAR grammar (every SCC
    purely left- or right-linear — run regular_approximation first).
    Components are processed in reverse topological order; each linear
    component is solved as a system of regex equations by Gaussian
    elimination with Arden's lemma (X = rX + s => X = r*s for right
    recursion, X = Xr + s => X = sr* for left). Returns the start NT's
    regex, or None if its language is empty."""
    r: dict[int, str | None] = {}

    def sym_rx(sym: tuple) -> str | None:
        if sym[0] == T:
            return re.escape(sym[1])
        return r.get(sym[1], None)

    for comp in sccs(g):
        cset = set(comp)
        kind = recursion_kind(g, cset)
        if kind == BOTH:
            raise ValueError("grammar is not strongly regular; approximate first")
        if kind == NONE and all(
            s[1] not in cset for a in comp for p in g.prods[a] for s in p if s[0] == N
        ):
            # trivial component: direct substitution
            for a in comp:
                parts: list[str | None] = []
                for p in g.prods[a]:
                    acc: str | None = ""
                    for s in p:
                        acc = _cat(acc, sym_rx(s))
                    parts.append(acc)
                r[a] = _alt(parts)
            continue
        # linear system over the component.
        # right-linear:  X_a = Σ coef[a][b]·X_b + const_a
        # left-linear :  X_a = Σ X_b·coef[a][b] + const_a
        right = kind != LEFT
        coef: dict[int, dict[int, list[str | None]]] = {a: {} for a in comp}
        const: dict[int, list[str | None]] = {a: [] for a in comp}
        for a in comp:
            for p in g.prods[a]:
                in_syms = [s for s in p if _in(s, cset)]
                if not in_syms:
                    acc: str | None = ""
                    for s in p:
                        acc = _cat(acc, sym_rx(s))
                    const[a].append(acc)
                    continue
                b = in_syms[0][1]
                out_syms = [s for s in p if not _in(s, cset)]
                acc = ""
                for s in out_syms:
                    acc = _cat(acc, sym_rx(s))
                coef[a].setdefault(b, []).append(acc)
        A = {a: {b: _alt(v) for b, v in coef[a].items()} for a in comp}
        K = {a: _alt(const[a]) for a in comp}
        order = list(comp)
        # forward elimination
        for i, x in enumerate(order):
            self_c = A[x].pop(x, None)
            if self_c is not None:
                st = _star(self_c)
                if right:
                    A[x] = {b: _cat(st, _grp(c) if c else c) for b, c in A[x].items()}
                    K[x] = _cat(st, _grp(K[x]) if K[x] else K[x])
                else:
                    A[x] = {b: _cat(_grp(c) if c else c, st) for b, c in A[x].items()}
                    K[x] = _cat(_grp(K[x]) if K[x] else K[x], st)
            for y in order[i + 1 :]:
                cxy = A[y].pop(x, None)
                if cxy is None:
                    continue
                for b, cxb in A[x].items():
                    term = _cat(cxy, cxb) if right else _cat(cxb, cxy)
                    A[y][b] = _alt([A[y].get(b), term])
                kterm = _cat(cxy, K[x]) if right else _cat(K[x], cxy)
                K[y] = _alt([K[y], kterm])
        # back substitution: after forward elimination, equation x only
        # references variables later in `order`, whose K is already final
        for i in range(len(order) - 1, -1, -1):
            x = order[i]
            for b, c in A[x].items():
                term = _cat(c, K[b]) if right else _cat(K[b], c)
                K[x] = _alt([K[x], term])
            r[x] = K[x]
    return r.get(start)
