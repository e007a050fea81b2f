import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)


@pytest.fixture(scope="session")
def spark():
    from kgnorm.session import get_spark

    spark = get_spark("kgnorm-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def ontology_bundle():
    from kgnorm.ontology import load_fixture_ontology

    return load_fixture_ontology()


@pytest.fixture(scope="session")
def automaton(ontology_bundle):
    from kgnorm.ac import build_automaton

    return build_automaton(ontology_bundle.dictionary)


@pytest.fixture(scope="session")
def golden_notes():
    from kgnorm.synth import load_golden_notes

    return load_golden_notes()
