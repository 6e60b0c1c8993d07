"""Reference meta/*.json config adapters."""

import json

import numpy as np
import pytest

from jodalrob_twotower_tpu.etl.categorical import CategoricalPreprocessor
from jodalrob_twotower_tpu.etl.numeric import NumericPreprocessor
from jodalrob_twotower_tpu.etl.reference_configs import (
    categorical_configs_from_reference,
    numeric_configs_from_reference,
    text_configs_from_reference,
)

_NUMERIC = {
    "bdgtamt": {"fill": "median", "log1p": True, "scale": "zscore",
                "add_flag": True, "clip": [0.5, 99.5]},
    "indstrytyevlrt": {"fill": 0, "log1p": False, "scale": "none",
                       "add_flag": True, "clip_abs": [0.0, 100.0]},
    "totprdprcnum": {"fill": "mode", "log1p": False, "scale": "none", "add_flag": True},
}

_CATEGORICAL = {
    "bidmethdnm": {"encoding_method": "label"},
    "ntceinsttcd": {"encoding_method": "label", "rare_threshold": 0.5},
}

_TEXT = {
    "bidntcenm": {"use": True, "embedding_model": "some/model", "max_length": 32,
                  "normalize": True, "add_flag": True, "null_strategy": "empty"},
    "skipped": {"use": False},
}


def test_numeric_adapter():
    cfgs = numeric_configs_from_reference(_NUMERIC)
    assert cfgs["bdgtamt"].clip_percentiles == (0.5, 99.5)
    assert cfgs["bdgtamt"].log1p and cfgs["bdgtamt"].scale == "zscore"
    # numeric fill constant
    c = cfgs["indstrytyevlrt"]
    assert c.fill == "constant" and c.fill_constant == 0.0
    assert c.clip_values == (0.0, 100.0)
    assert cfgs["totprdprcnum"].fill == "mode"

    # configs actually drive the preprocessor
    pre = NumericPreprocessor(cfgs)
    data = {"bdgtamt": np.array([1.0, 10.0, 100.0, np.nan]),
            "indstrytyevlrt": np.array([-5.0, 50.0, 200.0, 1.0]),
            "totprdprcnum": np.array([1.0, 1.0, 2.0, np.nan])}
    out = pre.fit_transform(data)
    np.testing.assert_allclose(
        out["indstrytyevlrt"], [0.0, 50.0, 100.0, 1.0]
    )  # clip_abs applied, no scale
    assert out["totprdprcnum"][3] == 1.0  # mode fill


def test_categorical_adapter_fractional_threshold():
    cfgs = categorical_configs_from_reference(_CATEGORICAL)
    assert cfgs["ntceinsttcd"].rare_threshold_fraction == 0.5
    pre = CategoricalPreprocessor(cfgs)
    # 10 rows, threshold 0.5 -> values with count < 5 collapse
    vals = np.array(["a"] * 6 + ["b"] * 3 + ["c"] * 1, object)
    pre.fit({"ntceinsttcd": vals, "bidmethdnm": vals})
    assert "a" in pre.vocabs["ntceinsttcd"]
    assert "b" not in pre.vocabs["ntceinsttcd"]  # 3 < 5
    assert "b" in pre.vocabs["bidmethdnm"]  # no threshold on this column

    with pytest.raises(ValueError, match="encoding_method"):
        categorical_configs_from_reference({"x": {"encoding_method": "hash"}})


def test_text_adapter(tmp_path):
    p = tmp_path / "text.json"
    p.write_text(json.dumps(_TEXT))
    cfgs, model = text_configs_from_reference(p)
    assert model == "some/model"
    assert list(cfgs) == ["bidntcenm"]  # use=False column skipped
    assert cfgs["bidntcenm"].max_length == 32 and cfgs["bidntcenm"].normalize


def test_adapters_on_real_reference_files():
    """The shipped reference meta configs parse without error (read-only)."""
    import pathlib

    ref = pathlib.Path("/root/reference/meta")
    if not ref.exists():
        pytest.skip("reference not mounted")
    n = numeric_configs_from_reference(ref / "notice_numeric_config.json")
    assert len(n) >= 20
    c = categorical_configs_from_reference(ref / "notice_categorical_config.json")
    assert len(c) >= 25
    t, model = text_configs_from_reference(ref / "notice_text_config.json")
    assert "bidntcenm" in t and model
