"""Regex-driven string generation compiled to pure Catalyst SQL.

The reference's 4th generator type (``random|oneOf|regex|sql``,
``api Constants.scala:145-148``) evaluates ``faker.regexify(pattern)`` in a
row-at-a-time UDF (``RegexDataGenerator.scala:27-29`` emits
``GENERATE_REGEX('...')``).  Re-expressed Spark-first: a bounded regex
subset compiles to ONE SQL expression (CONCAT of per-atom picks over
TRANSFORM/ARRAY_REPEAT/ELEMENT_AT) — whole-stage-codegen'd, no Python, no
UDF registry, and seedable for reproducible fixtures.

Supported subset (covers every pattern in the reference's sample task
YAMLs, e.g. ``ACC100[0-9]{5}``, ``ACC1[0-9]{9}``, ``[A-Z]{2}[0-9]{4}``):

* literal characters (and ``\\.`` ``\\-`` … escapes)
* character classes ``[a-zA-Z0-9_-]`` with ranges (no negation)
* shorthand ``\\d`` -> ``[0-9]``, ``\\w`` -> ``[a-zA-Z0-9_]``
* quantifiers ``{n}``, ``{n,m}``, ``?``, ``+``, ``*`` (unbounded ones are
  capped at ``max_repeat`` — generation must be bounded)
* alternation groups ``(abc|def|ghi)`` (nestable)

Anything outside the subset raises ``ValueError`` at plan-build time (the
reference throws ``InvalidDataGeneratorConfigurationException`` equally
eagerly when the pattern metadata is missing).
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_MAX_REPEAT = 5

_SHORTHAND = {"d": "0123456789", "w": None, "s": " \t\n\r\f"}
_WORD_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)
_SHORTHAND["w"] = _WORD_CHARS


@dataclass
class _Atom:
    """One generation unit: a literal, a char-class pick, or a group of
    alternative branches; repeated [lo, hi] times."""

    kind: str  # literal | class | group
    literal: str = ""
    chars: str = ""
    branches: tuple[list["_Atom"], ...] = ()
    lo: int = 1
    hi: int = 1


class _Parser:
    def __init__(self, pattern: str, max_repeat: int):
        self.p = pattern
        self.i = 0
        self.max_repeat = max_repeat

    def fail(self, msg: str) -> ValueError:
        return ValueError(
            f"unsupported regex for SQL generation at pos {self.i} "
            f"({msg}): {self.p!r}"
        )

    def peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    # -- grammar: seq := atom* ; atom := (literal|class|group) quant? ------
    def parse_seq(self, stop: set[str]) -> list[_Atom]:
        out: list[_Atom] = []
        while (ch := self.peek()) is not None and ch not in stop:
            out.append(self.parse_atom())
        return out

    def parse_atom(self) -> _Atom:
        ch = self.take()
        if ch == "[":
            atom = _Atom(kind="class", chars=self.parse_class())
        elif ch == "(":
            atom = self.parse_group()
        elif ch == "\\":
            atom = self.parse_escape()
        elif ch in ")]{}|*+?":
            raise self.fail(f"unexpected {ch!r}")
        elif ch == ".":
            raise self.fail("bare '.' (use an explicit class)")
        else:
            atom = _Atom(kind="literal", literal=ch)
        return self.parse_quant(atom)

    def parse_escape(self) -> _Atom:
        if self.peek() is None:
            raise self.fail("dangling backslash")
        ch = self.take()
        if ch in _SHORTHAND:
            return _Atom(kind="class", chars=_SHORTHAND[ch])
        if ch.isalnum():
            raise self.fail(f"unsupported escape \\{ch}")
        return _Atom(kind="literal", literal=ch)

    def parse_class(self) -> str:
        chars: list[str] = []
        while (ch := self.peek()) is not None and ch != "]":
            self.take()
            if ch == "^" and not chars:
                raise self.fail("negated class")
            if ch == "\\":
                nxt = self.take()
                if nxt in _SHORTHAND:
                    chars.extend(_SHORTHAND[nxt])
                    continue
                ch = nxt
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.take()  # '-'
                hi = self.take()
                if ord(hi) < ord(ch):
                    raise self.fail(f"bad range {ch}-{hi}")
                chars.extend(chr(c) for c in range(ord(ch), ord(hi) + 1))
            else:
                chars.append(ch)
        if self.peek() != "]":
            raise self.fail("unterminated class")
        self.take()
        if not chars:
            raise self.fail("empty class")
        # dedupe, preserve order
        return "".join(dict.fromkeys(chars))

    def parse_group(self) -> _Atom:
        branches: list[list[_Atom]] = [self.parse_seq({"|", ")"})]
        while self.peek() == "|":
            self.take()
            branches.append(self.parse_seq({"|", ")"}))
        if self.peek() != ")":
            raise self.fail("unterminated group")
        self.take()
        return _Atom(kind="group", branches=tuple(branches))

    def parse_quant(self, atom: _Atom) -> _Atom:
        ch = self.peek()
        if ch == "?":
            self.take()
            atom.lo, atom.hi = 0, 1
        elif ch == "+":
            self.take()
            atom.lo, atom.hi = 1, self.max_repeat
        elif ch == "*":
            self.take()
            atom.lo, atom.hi = 0, self.max_repeat
        elif ch == "{":
            self.take()
            j = self.p.find("}", self.i)
            if j < 0:
                raise self.fail("unterminated {}")
            body = self.p[self.i : j]
            self.i = j + 1
            parts = body.split(",")
            if not all(x.strip().isdigit() or x.strip() == "" for x in parts):
                raise self.fail(f"bad quantifier {{{body}}}")
            if len(parts) == 1:
                atom.lo = atom.hi = int(parts[0])
            elif len(parts) == 2:
                atom.lo = int(parts[0]) if parts[0].strip() else 0
                atom.hi = int(parts[1]) if parts[1].strip() else max(
                    atom.lo, self.max_repeat
                )
            else:
                raise self.fail(f"bad quantifier {{{body}}}")
            if atom.lo > atom.hi:
                raise self.fail(f"bad quantifier {{{body}}}")
        return atom


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


class _Renderer:
    """Renders atoms to SQL.  Every random draw gets its OWN derived seed:
    two draws sharing one seeded RAND stream would be perfectly correlated
    (e.g. both digits of ``[0-9]{2}…[0-9]{2}`` identical in every row)."""

    def __init__(self, seed: int | None):
        self.seed = seed
        self.n = 0

    def rand(self) -> str:
        if self.seed is None:
            return "RAND()"
        self.n += 1
        return f"RAND({self.seed + self.n})"

    def pick_int(self, n: int) -> str:
        """Uniform int in [0, n): least-significant-digits trick keeps the
        draw unbiased and never out of range (RAND() < 1.0 strictly)."""
        return f"CAST({self.rand()} * {n} AS INT)"

    def once(self, atom: _Atom) -> str:
        if atom.kind == "literal":
            return _sql_str(atom.literal)
        if atom.kind == "class":
            if len(atom.chars) == 1:
                return _sql_str(atom.chars)
            return (
                f"SUBSTR({_sql_str(atom.chars)}, "
                f"{self.pick_int(len(atom.chars))} + 1, 1)"
            )
        if atom.kind == "group":
            rendered = [self.seq(list(b)) for b in atom.branches]
            if len(rendered) == 1:
                return rendered[0]
            return (
                f"ELEMENT_AT(ARRAY({', '.join(rendered)}), "
                f"{self.pick_int(len(rendered))} + 1)"
            )
        raise AssertionError(atom.kind)

    def repeated(self, atom: _Atom) -> str:
        if atom.lo == 1 and atom.hi == 1:
            return self.once(atom)
        if atom.lo == atom.hi:
            n_expr = str(atom.lo)
        else:
            n_expr = (
                f"CAST({self.rand()} * {atom.hi - atom.lo + 1} AS INT) + {atom.lo}"
            )
        body = self.once(atom)
        # ARRAY_REPEAT(1, 0) -> [] (SEQUENCE(1, 0) would count DOWN)
        return (
            f"CONCAT_WS('', TRANSFORM(ARRAY_REPEAT(1, {n_expr}), "
            f"__r{self.n} -> {body}))"
        )

    def seq(self, atoms: list[_Atom]) -> str:
        if not atoms:
            return "''"
        parts: list[str] = []
        lit_run: list[str] = []
        for a in atoms:
            if a.kind == "literal" and a.lo == 1 and a.hi == 1:
                lit_run.append(a.literal)
                continue
            if lit_run:
                parts.append(_sql_str("".join(lit_run)))
                lit_run = []
            parts.append(self.repeated(a))
        if lit_run:
            parts.append(_sql_str("".join(lit_run)))
        if len(parts) == 1:
            return parts[0]
        return f"CONCAT({', '.join(parts)})"


def regex_sql(
    pattern: str,
    seed: int | None = None,
    max_repeat: int = DEFAULT_MAX_REPEAT,
) -> str:
    """Compile ``pattern`` to one Catalyst SQL string expression."""
    parser = _Parser(pattern, max_repeat)
    atoms = parser.parse_seq(stop=set())
    if parser.i != len(pattern):
        raise parser.fail("trailing input")
    return _Renderer(seed).seq(atoms)
