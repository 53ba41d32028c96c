"""Sampling-driven type tightening: decision matrix + live Spark agg."""

from __future__ import annotations

import datetime as dt

from goe_spark.types.canonical import (
    DATE,
    DECIMAL,
    DOUBLE,
    INTEGER_1,
    INTEGER_2,
    INTEGER_4,
    INTEGER_8,
    INTEGER_38,
    VARIABLE_STRING,
)
from goe_spark.types.sampling import (
    NumericSample,
    build_sampling_aggs,
    tighten_date,
    tighten_from_sample_row,
    tighten_numeric,
)
from tests.conftest import SF_SMALL


class TestDecisionMatrix:
    def test_integral_classifies_by_magnitude(self):
        assert tighten_numeric("c", NumericSample(3, 0)).data_type == INTEGER_2
        assert tighten_numeric("c", NumericSample(7, 0)).data_type == INTEGER_4
        assert tighten_numeric("c", NumericSample(12, 0)).data_type == INTEGER_8
        assert tighten_numeric("c", NumericSample(25, 0)).data_type == INTEGER_38

    def test_sampled_18_digit_edge_rounds_up(self):
        # the sample may have missed the true max → INTEGER_38, not _8
        assert tighten_numeric("c", NumericSample(18, 0)).data_type == INTEGER_38

    def test_fractional_becomes_decimal(self):
        col = tighten_numeric("c", NumericSample(8, 4))
        assert col.data_type == DECIMAL
        assert (col.data_precision, col.data_scale) == (12, 4)
        assert col.safe_mapping is False

    def test_overflow_rejected_unless_rounding_allowed(self):
        # mag 36 + scale 10 can't fit DECIMAL(38): silently keeping
        # scale 10 would leave only 28 integral digits — less than the
        # sample itself observed, so real values would try_cast to
        # NULL at final load. Reject instead.
        import pytest

        from goe_spark.types.sampling import SamplingTightenError

        with pytest.raises(SamplingTightenError):
            tighten_numeric("c", NumericSample(36, 10))
        # The explicit opt-in (reference --allow-decimal-scale-rounding)
        # sacrifices scale, never integral capacity.
        col = tighten_numeric("c", NumericSample(36, 10), allow_scale_rounding=True)
        assert (col.data_precision, col.data_scale) == (38, 2)
        # Magnitude beyond 38 digits is unconditionally rejected.
        with pytest.raises(SamplingTightenError):
            tighten_numeric("c", NumericSample(40, 0), allow_scale_rounding=True)

    def test_e_notation_forces_double(self):
        assert (
            tighten_numeric("c", NumericSample(3, 2, has_e_notation=True)).data_type
            == DOUBLE
        )

    def test_date_range_fallback(self):
        assert tighten_date("d", dt.date(1997, 1, 1)).data_type == DATE
        assert tighten_date("d", None).data_type == DATE
        # proleptic out-of-range (reference: string fallback)
        assert (
            tighten_date("d", dt.date.min).data_type == DATE
        )  # date.min == year 1 is supported


class TestLiveSampling:
    def test_lineitem_tightening(self, spark):
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        numeric = ["l_quantity", "l_extendedprice", "l_discount"]
        dates = ["l_shipdate"]
        row = li.agg(*build_sampling_aggs(li, numeric, dates)).first().asDict()
        cols = {c.name: c for c in tighten_from_sample_row(row, numeric, dates)}
        # quantities are small integrals => narrowest INTEGER_n
        assert cols["l_quantity"].data_type in (INTEGER_1, INTEGER_2, INTEGER_4)
        # prices carry cents => DECIMAL with scale >= 1
        assert cols["l_extendedprice"].data_type == DECIMAL
        assert cols["l_extendedprice"].data_scale >= 1
        assert cols["l_discount"].data_type == DECIMAL
        assert cols["l_shipdate"].data_type == DATE
        assert all(c.safe_mapping is False for c in cols.values())
