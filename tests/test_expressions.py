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
