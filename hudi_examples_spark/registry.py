"""Assembles the full query registry for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

from hudi_examples_spark.operators.spec import QuerySpec


def all_specs() -> list[QuerySpec]:
    from hudi_examples_spark.operators import (
        llm_pipeline,
        llm_pipeline2,
        llm_pipeline3,
        llm_pipeline4,
        multimodal,
        relational,
        relational_ext,
        relational_tpch3,
        scale_ops,
    )

    # Order matters: the driver's correctness gate samples a prefix of this
    # list, so the engine-defining specs (table DML lifecycle, LLM data
    # pipeline) go first, followed by the core relational battery, with the
    # TPC-H extension battery last (it is the most redundantly covered).
    specs: list[QuerySpec] = []
    try:
        from hudi_examples_spark.operators import table_dml

        specs.extend(table_dml.SPECS)
    except ImportError:
        pass  # table layer not built yet in this round
    specs.extend(llm_pipeline.SPECS)
    specs.extend(llm_pipeline2.SPECS)
    specs.extend(llm_pipeline3.SPECS)
    specs.extend(llm_pipeline4.SPECS)
    specs.extend(scale_ops.SPECS)
    specs.extend(multimodal.SPECS)
    specs.extend(relational.SPECS)
    specs.extend(relational_ext.SPECS)
    specs.extend(relational_tpch3.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in registry"
    return specs


def queries_dict():
    return {s.name: s.fn for s in all_specs()}


def oracles_dict():
    return {s.name: s.oracle.strip() for s in all_specs() if s.oracle}
