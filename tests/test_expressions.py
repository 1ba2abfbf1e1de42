"""Faker-expression compiler tests: emitted SQL shape, vocabulary
membership, determinism, directive handling — mirroring the reference's
expression usage in its sample tasks (``json-account-task.yaml``
``#{Name.name}`` / ``#{Name.username}``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.operators import expressions as X
from data_caterer_spark.operators.generator import FieldSpec, generate


def test_vocab_pick_emission_shape():
    sql = X.expression_sql("#{Address.city}", seed=5)
    assert sql.startswith("ELEMENT_AT(ARRAY('Amsterdam'")
    assert "RAND(102)" in sql  # derived seed: 5 + 97*1


def test_literal_text_preserved():
    sql = X.expression_sql("id-#{options.option 'a','b'}-x", seed=1)
    assert sql.startswith("CONCAT('id-', ELEMENT_AT(ARRAY('a', 'b')")
    assert sql.endswith(", '-x')")


def test_unknown_provider_raises():
    with pytest.raises(ValueError, match="unknown faker provider"):
        X.expression_sql("#{Nope.nothing}")
    with pytest.raises(ValueError, match="no options"):
        X.expression_sql("#{options.option}")


def test_vocabulary_closure():
    vocab = X.expression_vocabulary("#{Name.name}")
    assert vocab is not None
    assert len(vocab) == len(X.FIRST_NAMES) * len(X.LAST_NAMES)
    assert "Aaron Adams" in vocab
    # unbounded directives have no finite vocabulary
    assert X.expression_vocabulary("#{numerify '##'}") is None
    assert X.expression_vocabulary("x#{options.option 'p','q'}") == {"xp", "xq"}


def test_generated_values_in_vocabulary(spark):
    fields = [
        FieldSpec("full_name", expression="#{Name.name}", seed=60),
        FieldSpec("username", expression="#{Name.username}", seed=61),
        FieldSpec("email", expression="#{Internet.emailAddress}", seed=62),
        FieldSpec("addr", expression="#{Address.fullAddress}", seed=63),
        FieldSpec("serial", expression="#{bothify 'S-##??'}", seed=64),
    ]
    rows = generate(spark, fields, 300, num_partitions=2).collect()
    names = X.expression_vocabulary("#{Name.name}")
    users = X.expression_vocabulary("#{Name.username}")
    emails = X.expression_vocabulary("#{Internet.emailAddress}")
    import re

    for r in rows:
        assert r["full_name"] in names
        assert r["username"] in users
        assert r["email"] in emails
        assert re.fullmatch(
            r"\d{3} [A-Za-z ]+(Lane|Street|Avenue|Court|Drive|Road|"
            r"Boulevard|Way|Place), [A-Za-z]+",
            r["addr"],
        ), r["addr"]
        assert re.fullmatch(r"S-[0-9]{2}[a-z]{2}", r["serial"]), r["serial"]
    # independent streams: first and last names are not locked together
    assert len({r["full_name"] for r in rows}) > 20


def test_seeded_expression_is_deterministic(spark):
    fields = [FieldSpec("n", expression="#{Name.name}", seed=9)]
    a = [r["n"] for r in generate(spark, fields, 50, num_partitions=2).collect()]
    b = [r["n"] for r in generate(spark, fields, 50, num_partitions=2).collect()]
    assert a == b


def test_regexify_delegates_to_regex_compiler(spark):
    df = generate(
        spark,
        [FieldSpec("code", expression="#{regexify 'AB[0-9]{3}'}", seed=3)],
        100,
        num_partitions=2,
    )
    ok = df.agg(F.count_if(F.col("code").rlike("^AB[0-9]{3}$"))).first()[0]
    assert ok == 100


def test_reference_sample_expressions_all_compile(spark):
    """Enumerate every #{...} expression in the reference's sample tasks
    and scripts; each must compile to one Catalyst expression and
    evaluate.  (Reference surface scan — skipped when the reference
    checkout is absent in a standalone deployment.)"""
    import glob
    import os
    import re

    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout not present")
    exprs: set[str] = set()
    pats = ["app/src/test/resources/sample/**/*.yaml", "script/**/*.yaml"]
    for pat in pats:
        for path in glob.glob(os.path.join(ref, pat), recursive=True):
            with open(path, errors="ignore") as f:
                exprs.update(re.findall(r"#\{[A-Za-z]+\.[^}]+\}", f.read()))
    assert exprs, "reference sample scan found no expressions"
    fields = [
        FieldSpec(f"e{i}", expression=e, seed=11 + i)
        for i, e in enumerate(sorted(exprs))
    ]
    rows = generate(spark, fields, 20, num_partitions=2).collect()
    for i, e in enumerate(sorted(exprs)):
        vocab = X.expression_vocabulary(e)
        for r in rows:
            v = r[f"e{i}"]
            assert isinstance(v, str) and v
            if vocab is not None:
                assert v in vocab, (e, v)


def test_uuid_provider_is_v4_shaped_and_seeded(spark):
    df = generate(
        spark,
        [
            FieldSpec("u", expression="#{Internet.uuid}", seed=21),
            FieldSpec("u2", expression="#{Internet.uuid}", seed=21),
            FieldSpec("u3", expression="#{Internet.uuid}"),
        ],
        200,
        num_partitions=4,
    )
    import re

    v4 = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    rows = df.collect()
    assert all(v4.match(r["u"]) for r in rows)
    # same seed -> identical stream; five substring slices stay consistent
    assert all(r["u"] == r["u2"] for r in rows)
    # unseeded path: Spark native UUID(), still v4-shaped
    assert all(v4.match(r["u3"]) for r in rows)
    assert len({r["u"] for r in rows}) == len(rows)


def test_new_provider_breadth_compiles(spark):
    exprs = {
        "dom": "#{Internet.domainName}",
        "url": "#{Internet.url}",
        "sex": "#{Demographic.sex}",
        "cur": "#{Currency.code}",
        "ind": "#{Company.industry}",
    }
    fields = [
        FieldSpec(k, expression=e, seed=31) for k, e in exprs.items()
    ]
    rows = generate(spark, fields, 30, num_partitions=2).collect()
    for k, e in exprs.items():
        vocab = X.expression_vocabulary(e)
        assert vocab is not None
        assert all(r[k] in vocab for r in rows), k
    assert all(r["dom"].endswith(".com") for r in rows)
    assert all(r["url"].startswith("www.") for r in rows)


def test_reference_sample_expressions_all_compile():
    """Every ``#{...}`` faker expression appearing in the reference's
    bundled sample resources compiles to SQL.

    The hard-coded set is the exhaustive scan of
    ``app/src/test/resources/sample/`` (json-account-task.yaml uses
    ``#{Name.name}`` / ``#{Name.username}``; docs/test fixtures add
    ``#{Address.city}`` / ``#{Company.name}``); when the reference
    checkout is present the set is re-scanned live so drift in the
    samples fails here rather than silently shrinking coverage."""
    import os
    import re

    known = {
        "#{Name.name}",
        "#{Name.username}",
        "#{Address.city}",
        "#{Company.name}",
    }
    ref = "/root/reference"
    found = set()
    if os.path.isdir(ref):
        pat = re.compile(r"#\{[A-Za-z]+\.[A-Za-z_]+(?: '[^']*')?\}")
        for root, _dirs, files in os.walk(ref):
            for fn in files:
                if not fn.endswith((".yaml", ".yml", ".json", ".scala")):
                    continue
                try:
                    with open(os.path.join(root, fn), errors="ignore") as f:
                        found |= set(pat.findall(f.read()))
                except OSError:
                    continue
        assert known <= found, found
    for expr in sorted(known | found):
        sql = X.expression_sql(expr, seed=7)
        assert sql and "ELEMENT_AT" in sql.upper() or "CONCAT" in sql.upper()
