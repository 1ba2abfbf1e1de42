"""Faker-style expression generation — offline, deterministic, pure SQL.

The reference feeds ``FieldSpec(expression = "#{Name.name}")`` strings to a
datafaker UDF (``GENERATE_FAKER_EXPRESSION`` —
``DataGeneratorFactory.scala:125``; emitted by
``RandomDataGenerator.scala:63-66`` whenever a string field carries the
``expression`` metadata key; used by most sample tasks, e.g.
``json-account-task.yaml`` ``#{Name.name}`` / ``#{Name.username}``).  That
UDF is row-at-a-time Java and needs the datafaker artifact; this module
re-expresses the same expression surface as COMPILED CATALYST SQL over
deterministic offline provider vocabularies — the same deployment shape as
the oneOf pick (``ELEMENT_AT(ARRAY(...), seeded-rand)``), so generation
stays whole-stage-codegen'd and cluster-size invariant.

Supported expression subset (datafaker's public grammar):

* ``#{Provider.method}``       — vocabulary pick or template expansion
* ``#{numerify '...'}``        — ``#`` placeholders -> random digits
* ``#{letterify '...'}``       — ``?`` placeholders -> random lowercase letters
* ``#{bothify '...'}``         — both of the above
* ``#{regexify '...'}``        — delegated to the bounded-regex compiler
  (``operators/regexgen.py``)
* ``#{options.option 'a','b'}``— inline categorical pick
* literal text around/between placeholders is preserved

Provider templates compose (``Name.name`` -> first + last), exactly like
datafaker resolves yaml templates recursively.  Each placeholder draws from
its own derived seed, so one expression yields independent streams and the
whole value is reproducible from ``FieldSpec.seed``.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# offline provider vocabularies (deterministic, alphabetical, ASCII)
# ---------------------------------------------------------------------------

FIRST_NAMES = [
    "Aaron", "Alice", "Amara", "Ben", "Carla", "Chen", "Diego", "Elena",
    "Fatima", "Grace", "Hiro", "Ines", "James", "Kavya", "Liam", "Maria",
    "Noah", "Olga", "Priya", "Quinn", "Ravi", "Sofia", "Tomas", "Uma",
    "Victor", "Wendy", "Xavier", "Yuki", "Zara",
]
LAST_NAMES = [
    "Adams", "Brown", "Chen", "Diaz", "Evans", "Fischer", "Garcia",
    "Hansen", "Ivanov", "Jones", "Kim", "Lopez", "Miller", "Nguyen",
    "Okafor", "Patel", "Quintero", "Rossi", "Schmidt", "Tanaka", "Ueda",
    "Vargas", "Wang", "Xu", "Yilmaz", "Zhang",
]
CITIES = [
    "Amsterdam", "Berlin", "Cairo", "Denver", "Edinburgh", "Fukuoka",
    "Geneva", "Hanoi", "Istanbul", "Jakarta", "Kyoto", "Lagos", "Madrid",
    "Nairobi", "Oslo", "Porto", "Quito", "Riga", "Seoul", "Tunis",
    "Utrecht", "Vienna", "Warsaw", "Xiamen", "Yerevan", "Zagreb",
]
STREET_NAMES = [
    "Alder Lane", "Birch Street", "Cedar Avenue", "Dogwood Court",
    "Elm Drive", "Fir Road", "Grove Boulevard", "Hazel Way", "Ivy Place",
    "Juniper Street", "Kings Road", "Linden Avenue", "Maple Lane",
    "Ninth Street", "Oak Drive", "Pine Court", "Quarry Road",
    "Rose Boulevard", "Spruce Way", "Third Avenue",
]
COMPANY_NAMES = [
    "Acme Corp", "Blue Ridge Ltd", "Cobalt Systems", "Delta Works",
    "Everline Group", "Fathom Labs", "Granite Holdings", "Harbor Logic",
    "Iron Gate Inc", "Juniper Trading", "Keystone Partners", "Lumen Co",
    "Meridian Industries", "Northwind LLC", "Orchid Software",
    "Pinnacle Goods", "Quartz Analytics", "Redwood Supply",
    "Summit Ventures", "Tidewater Group",
]
JOB_TITLES = [
    "Accountant", "Analyst", "Architect", "Consultant", "Designer",
    "Developer", "Director", "Engineer", "Manager", "Nurse", "Officer",
    "Planner", "Researcher", "Specialist", "Supervisor", "Technician",
]
COUNTRIES = [
    "Argentina", "Brazil", "Canada", "Denmark", "Egypt", "France",
    "Germany", "Hungary", "India", "Japan", "Kenya", "Lithuania",
    "Mexico", "Norway", "Oman", "Portugal", "Qatar", "Romania", "Spain",
    "Thailand", "Uruguay", "Vietnam",
]

#: ``Provider.method`` -> list (vocabulary pick) or str (template expanded
#: recursively).  Keys use datafaker's public names so reference YAML tasks
#: parse unchanged.
#: provider spec: a value list (categorical pick), a template string
#: (recursive compile), or a callable seed->SQL (custom constructions
#: like Internet.uuid)
PROVIDERS: dict[str, "list[str] | str | Callable"] = {
    "Name.firstName": FIRST_NAMES,
    "Name.lastName": LAST_NAMES,
    "Name.name": "#{Name.firstName} #{Name.lastName}",
    "Name.fullName": "#{Name.firstName} #{Name.lastName}",
    "Name.username": "#{Name.firstName}.#{Name.lastName}",  # lowercased below
    "Address.city": CITIES,
    "Address.cityName": CITIES,
    "Address.streetName": STREET_NAMES,
    "Address.streetAddress": "#{numerify '###'} #{Address.streetName}",
    "Address.fullAddress": (
        "#{numerify '###'} #{Address.streetName}, #{Address.city}"
    ),
    "Address.country": COUNTRIES,
    "Company.name": COMPANY_NAMES,
    "Company.suffix": ["Inc", "LLC", "Group", "Ltd", "and Sons"],
    "Company.industry": [
        "Banking", "Insurance", "Retail", "Logistics",
        "Telecommunications", "Health Care", "Utilities",
    ],
    "Job.title": JOB_TITLES,
    "Job.field": [
        "Accounting", "Engineering", "Legal", "Marketing", "Medical",
        "Education", "Construction",
    ],
    "Country.name": COUNTRIES,
    "Internet.emailAddress": "#{Name.firstName}.#{Name.lastName}@example.com",
    "Internet.domainWord": [
        "acme", "globex", "initech", "umbrella", "hooli", "vandelay",
        "wonka", "stark",
    ],
    "Internet.domainName": "#{Internet.domainWord}.com",
    "Internet.url": "www.#{Internet.domainWord}.com",
    # Internet.uuid is a callable spec (seeded hex construction below)
    "PhoneNumber.phoneNumber": "#{numerify '(###) ###-####'}",
    "PhoneNumber.cellPhone": "#{numerify '###-###-####'}",
    "Demographic.sex": ["Male", "Female"],
    "Demographic.maritalStatus": [
        "Single", "Married", "Widowed", "Divorced",
    ],
    "Demographic.race": [
        "White", "Black or African American", "Asian",
        "American Indian or Alaska Native",
        "Native Hawaiian or Other Pacific Islander",
    ],
    "Currency.code": ["USD", "EUR", "GBP", "JPY", "AUD", "CAD", "CHF"],
    "Color.name": [
        "red", "green", "blue", "yellow", "purple", "orange", "black",
        "white",
    ],
    "Animal.name": [
        "alligator", "bear", "cheetah", "dolphin", "eagle", "fox",
        "giraffe", "horse",
    ],
    "File.extension": ["csv", "json", "parquet", "txt", "xml", "orc"],
}


def _uuid_sql(seed: "int | None") -> str:
    """``Internet.uuid``: RFC-4122-v4-SHAPED uuid from one seeded hex
    stream.  Seeded: every occurrence of RAND(seed) in a projection
    draws the identical per-row value, so the five substrings slice ONE
    consistent 32-hex digest; version nibble pinned to '4', variant
    picked from [89ab].  Unseeded falls back to Spark's native UUID()."""
    if seed is None:
        return "UUID()"
    h = f"MD5(CAST(RAND({seed}) AS STRING))"
    variant = (
        f"ELEMENT_AT(ARRAY('8','9','a','b'), "
        f"(CAST(CONV(SUBSTR({h}, 17, 1), 16, 10) AS INT) % 4) + 1)"
    )
    return (
        f"CONCAT(SUBSTR({h}, 1, 8), '-', SUBSTR({h}, 9, 4), '-4', "
        f"SUBSTR({h}, 14, 3), '-', {variant}, SUBSTR({h}, 18, 3), '-', "
        f"SUBSTR({h}, 21, 12))"
    )


PROVIDERS["Internet.uuid"] = _uuid_sql

#: providers whose datafaker output is lowercase
_LOWERCASE = {"Name.username", "Internet.emailAddress"}

# braces inside quoted directive args ('AB[0-9]{3}') must not close the
# placeholder, so quoted spans are consumed atomically
_PLACEHOLDER = re.compile(r"#\{((?:'[^']*'|[^{}'])+)\}")
_DIGITS = "0123456789"
_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _rand(seed: int | None) -> str:
    return f"RAND({seed})" if seed is not None else "RAND()"


def _pick_sql(values: list[str], seed: int | None) -> str:
    """Seeded categorical pick — the oneOf emission
    (``OneOfDataGenerator.scala:25-28``)."""
    rendered = ", ".join(_sql_str(v) for v in values)
    return (
        f"ELEMENT_AT(ARRAY({rendered}), "
        f"CAST({_rand(seed)} * {len(values)} AS INT) + 1)"
    )


def _charfill_sql(template: str, chars: str, marker: str, seed: int | None) -> str:
    """``numerify``/``letterify``: every ``marker`` char becomes an
    independent seeded pick from ``chars``; literal runs stay literal."""
    parts: list[str] = []
    lit = ""
    draw = 0
    for ch in template:
        if ch == marker:
            if lit:
                parts.append(_sql_str(lit))
                lit = ""
            s = None if seed is None else seed + 131 * draw
            draw += 1
            parts.append(
                f"SUBSTR('{chars}', CAST({_rand(s)} * {len(chars)} AS INT) + 1, 1)"
            )
        else:
            lit += ch
    if lit:
        parts.append(_sql_str(lit))
    if len(parts) == 1:
        return parts[0]
    return f"CONCAT({', '.join(parts)})"


def _bothify_sql(template: str, seed: int | None) -> str:
    # two passes: '#' digits first, then '?' letters on the remaining text
    # can't compose via string SQL; walk once handling both markers
    parts: list[str] = []
    lit = ""
    draw = 0
    for ch in template:
        src = _DIGITS if ch == "#" else _LETTERS if ch == "?" else None
        if src is None:
            lit += ch
            continue
        if lit:
            parts.append(_sql_str(lit))
            lit = ""
        s = None if seed is None else seed + 131 * draw
        draw += 1
        parts.append(
            f"SUBSTR('{src}', CAST({_rand(s)} * {len(src)} AS INT) + 1, 1)"
        )
    if lit:
        parts.append(_sql_str(lit))
    if len(parts) == 1:
        return parts[0]
    return f"CONCAT({', '.join(parts)})"


def _quoted_arg(body: str, directive: str) -> str:
    m = re.match(rf"{directive}\s+'(.*)'\s*$", body, re.S)
    if not m:
        raise ValueError(f"malformed #{{{body}}}: expected {directive} '...'")
    return m.group(1)


def _resolve(body: str, seed: int | None, depth: int) -> str:
    """One placeholder body -> SQL expression."""
    if depth > 8:
        raise ValueError(f"faker expression nests too deep at #{{{body}}}")
    body = body.strip()
    if body.startswith("numerify"):
        return _charfill_sql(_quoted_arg(body, "numerify"), _DIGITS, "#", seed)
    if body.startswith("letterify"):
        return _charfill_sql(_quoted_arg(body, "letterify"), _LETTERS, "?", seed)
    if body.startswith("bothify"):
        return _bothify_sql(_quoted_arg(body, "bothify"), seed)
    if body.startswith("regexify"):
        from .regexgen import regex_sql

        return regex_sql(_quoted_arg(body, "regexify"), seed=seed)
    if body.startswith("options.option"):
        opts = re.findall(r"'([^']*)'", body[len("options.option"):])
        if not opts:
            raise ValueError(f"#{{{body}}}: no options given")
        return _pick_sql(list(opts), seed)
    spec = PROVIDERS.get(body)
    if spec is None:
        raise ValueError(
            f"unknown faker provider #{{{body}}}; known: "
            f"{sorted(PROVIDERS)} + numerify/letterify/bothify/"
            "regexify/options.option"
        )
    if callable(spec):
        return spec(seed)
    if isinstance(spec, list):
        return _pick_sql(spec, seed)
    inner = expression_sql(spec, seed=seed, _depth=depth + 1)
    if body in _LOWERCASE:
        inner = f"LOWER({inner})"
    return inner


def expression_sql(expression: str, seed: int | None = None, _depth: int = 0) -> str:
    """Compile a faker expression string to ONE Catalyst SQL expression.

    Literal text is preserved; every placeholder gets its own derived seed
    (``seed + 97 * ordinal``) so multi-placeholder expressions draw
    independent streams while the whole value stays reproducible.
    """
    parts: list[str] = []
    pos = 0
    ordinal = 0
    for m in _PLACEHOLDER.finditer(expression):
        if m.start() > pos:
            parts.append(_sql_str(expression[pos:m.start()]))
        s = None if seed is None else seed + 97 * (ordinal + 1) + 7919 * _depth
        ordinal += 1
        parts.append(_resolve(m.group(1), s, _depth))
        pos = m.end()
    if pos < len(expression):
        parts.append(_sql_str(expression[pos:]))
    if not parts:
        return _sql_str("")
    if len(parts) == 1:
        return parts[0]
    return f"CONCAT({', '.join(parts)})"


def expression_vocabulary(expression: str) -> "set[str] | None":
    """The finite value set an expression can produce, or None when a
    charfill/regexify directive makes it effectively unbounded — the
    invariant oracles check membership against this."""
    out: set[str] = {""}

    def cross(values: "set[str]") -> None:
        nonlocal out
        out = {a + b for a in out for b in values}

    pos = 0
    for m in _PLACEHOLDER.finditer(expression):
        if m.start() > pos:
            cross({expression[pos:m.start()]})
        body = m.group(1).strip()
        if body.startswith(("numerify", "letterify", "bothify", "regexify")):
            return None
        if body.startswith("options.option"):
            cross(set(re.findall(r"'([^']*)'", body)))
        else:
            spec = PROVIDERS.get(body)
            if spec is None:
                raise ValueError(f"unknown faker provider #{{{body}}}")
            if callable(spec):
                return None  # open-ended (e.g. uuid hex space)
            if isinstance(spec, list):
                cross(set(spec))
            else:
                sub = expression_vocabulary(spec)
                if sub is None:
                    return None
                if body in _LOWERCASE:
                    sub = {v.lower() for v in sub}
                cross(sub)
        pos = m.end()
    if pos < len(expression):
        cross({expression[pos:]})
    return out
