"""Finance pipeline tests (mirrors reference tests/test_finance_data.py:
log-return math, train-only standardization, embedding shape/shift,
leak-free chronological splits, cleaning, shift verifier)."""

import numpy as np
import pandas as pd
import pytest

from kmpc_tpu.config import Config, FinanceConfig
from kmpc_tpu.data.finance import (
    clean_price_data,
    compute_log_returns,
    compute_standardization_stats,
    create_finance_splits,
    generate_synthetic_prices,
    load_finance_data,
    standardize_returns,
    time_delay_embedding,
    verify_embedding_shift,
)


def _toy_prices(T=300, N=4, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.bdate_range("2015-01-01", periods=T)
    prices = 100 * np.exp(np.cumsum(rng.standard_normal((T, N)) * 0.01, axis=0))
    return pd.DataFrame(prices, index=dates, columns=[f"A{i}" for i in range(N)])


# ---------------------------------------------------------------------------
# Log returns
# ---------------------------------------------------------------------------


def test_log_returns_hand_calc():
    dates = pd.bdate_range("2020-01-01", periods=3)
    prices = pd.DataFrame({"X": [100.0, 110.0, 99.0]}, index=dates)
    lr = compute_log_returns(prices)
    assert len(lr) == 2
    assert np.isclose(lr.iloc[0, 0], np.log(110 / 100))
    assert np.isclose(lr.iloc[1, 0], np.log(99 / 110))


# ---------------------------------------------------------------------------
# Standardization (train-only stats)
# ---------------------------------------------------------------------------


def test_standardization_uses_train_only():
    prices = _toy_prices(T=300)
    lr = compute_log_returns(prices)
    train_end = str(lr.index[149].date())
    stats = compute_standardization_stats(lr, train_end)
    train_part = lr[lr.index <= train_end]
    assert np.allclose(stats.mean, train_part.mean().values)
    assert np.allclose(stats.std, np.maximum(train_part.std().values, 1e-8))

    std = standardize_returns(lr, stats)
    restored = std * stats.std + stats.mean
    assert np.allclose(restored.values, lr.values, atol=1e-10)


def test_standardization_no_train_data_raises():
    prices = _toy_prices(T=50)
    lr = compute_log_returns(prices)
    with pytest.raises(ValueError):
        compute_standardization_stats(lr, "1990-01-01")


# ---------------------------------------------------------------------------
# Time-delay embedding
# ---------------------------------------------------------------------------


def test_embedding_shape_and_content():
    T, N, d = 10, 3, 4
    data = np.arange(T * N, dtype=np.float32).reshape(T, N)
    emb = time_delay_embedding(data, d)
    assert emb.shape == (T - d + 1, d * N)
    # Row i block j holds data[i + d - 1 - j] (most recent first).
    for i in range(emb.shape[0]):
        for j in range(d):
            assert np.allclose(emb[i, j * N:(j + 1) * N], data[i + d - 1 - j])


def test_embedding_shift_property():
    data = np.random.default_rng(0).standard_normal((50, 5)).astype(np.float32)
    emb = time_delay_embedding(data, 7)
    assert verify_embedding_shift(emb, n_assets=5, embedding_dim=7)


def test_embedding_too_short_raises():
    with pytest.raises(ValueError):
        time_delay_embedding(np.zeros((3, 2), dtype=np.float32), 5)


def test_embedding_d1_is_identity():
    data = np.random.default_rng(1).standard_normal((20, 3)).astype(np.float32)
    emb = time_delay_embedding(data, 1)
    assert np.allclose(emb, data)


# ---------------------------------------------------------------------------
# Splits (leak-free)
# ---------------------------------------------------------------------------


def test_splits_boundaries_and_no_overlap():
    prices = _toy_prices(T=400)
    lr = compute_log_returns(prices)
    train_end = str(lr.index[199].date())
    val_end = str(lr.index[299].date())
    stats = compute_standardization_stats(lr, train_end)
    d = 5
    tr, tr_d, va, va_d, te, te_d = create_finance_splits(lr, stats, train_end, val_end, d)

    assert (tr_d <= train_end).all()
    assert ((va_d > train_end) & (va_d <= val_end)).all()
    assert (te_d > val_end).all()
    # Zero date overlap
    assert len(set(tr_d) & set(va_d)) == 0
    assert len(set(va_d) & set(te_d)) == 0
    assert len(set(tr_d) & set(te_d)) == 0
    # Total samples = embedded length
    assert len(tr) + len(va) + len(te) == len(lr) - d + 1
    assert tr.shape[1] == d * lr.shape[1]


# ---------------------------------------------------------------------------
# Cleaning
# ---------------------------------------------------------------------------


def test_clean_drops_sparse_assets_and_ffills():
    prices = _toy_prices(T=100)
    # Make one column 50% missing -> must be dropped.
    prices.iloc[::2, 0] = np.nan
    # Short gap in another column -> ffilled.
    prices.iloc[10:13, 1] = np.nan
    cleaned = clean_price_data(prices)
    assert "A0" not in cleaned.columns
    assert not cleaned.isna().any().any()
    # Gap rows filled with the last value before the gap.
    assert np.isclose(cleaned.iloc[10, 0], cleaned.iloc[9, 0])


# ---------------------------------------------------------------------------
# Synthetic panel + end-to-end loader
# ---------------------------------------------------------------------------


def test_synthetic_prices_deterministic():
    a = generate_synthetic_prices(["X", "Y"], "2020-01-01", "2020-06-30", seed=9)
    b = generate_synthetic_prices(["X", "Y"], "2020-01-01", "2020-06-30", seed=9)
    assert np.allclose(a.values, b.values)
    assert (a.values > 0).all()
    c = generate_synthetic_prices(["X", "Y"], "2020-01-01", "2020-06-30", seed=10)
    assert not np.allclose(a.values, c.values)


def _small_finance_cfg():
    cfg = Config()
    cfg.ENV.ENV_NAME = "finance"
    cfg.ENV.FINANCE = FinanceConfig(
        TICKERS=["T1", "T2", "T3"],
        START_DATE="2018-01-01",
        END_DATE="2021-12-31",
        TRAIN_END="2019-12-31",
        VAL_END="2020-12-31",
        EMBEDDING_DIM=4,
        CACHE_DIR=None,
        SYNTHETIC=True,
    )
    cfg.TRAIN.USE_SEQUENCE_LOSS = True
    cfg.TRAIN.SEQUENCE_LENGTH = 5
    return cfg


def test_load_finance_data_end_to_end():
    cfg = _small_finance_cfg()
    fd = load_finance_data(cfg)
    assert fd.observation_size == 4 * 3
    assert fd.n_assets == 3
    assert fd.embedding_dim == 4
    assert fd.sequence_length == 5
    assert fd.train.shape[0] > 100
    assert fd.test.shape[0] > 50
    # Metadata consistency
    assert fd.metadata["observation_size"] == fd.observation_size


def test_sample_batch_shapes_and_consecutiveness():
    import jax

    cfg = _small_finance_cfg()
    fd = load_finance_data(cfg)
    batch = fd.sample_batch(jax.random.PRNGKey(0), "train", batch_size=8)
    assert batch.shape == (8, 6, fd.observation_size)
    # Window rows must be consecutive rows of the split.
    data = np.asarray(fd.train)
    b = np.asarray(batch)
    for i in range(8):
        # Find the start row in the split, confirm the rest follows.
        matches = np.where((data == b[i, 0]).all(axis=1))[0]
        assert len(matches) >= 1
        s = matches[0]
        assert np.allclose(data[s:s + 6], b[i])


def test_get_test_sequences():
    cfg = _small_finance_cfg()
    fd = load_finance_data(cfg)
    init, future = fd.get_test_sequences(num_sequences=10, max_length=20)
    assert init.shape == (10, fd.observation_size)
    assert future.shape == (20, 10, fd.observation_size)
    # future[0] is the row after each start.
    data = np.asarray(fd.test)
    i0 = np.asarray(init[0])
    s = np.where((data == i0).all(axis=1))[0][0]
    assert np.allclose(data[s + 1], np.asarray(future[0, 0]))


def test_extract_and_destandardize():
    import jax.numpy as jnp

    cfg = _small_finance_cfg()
    fd = load_finance_data(cfg)
    obs = fd.test[:5]
    ret_std = fd.extract_current_returns(obs)
    assert ret_std.shape == (5, 3)
    ret = fd.destandardize_returns(ret_std)
    expected = np.asarray(ret_std) * fd.stats.std + fd.stats.mean
    assert np.allclose(np.asarray(ret), expected, atol=1e-6)


def test_cache_round_trip(tmp_path):
    cfg = _small_finance_cfg()
    cfg.ENV.FINANCE.CACHE_DIR = str(tmp_path)
    fd1 = load_finance_data(cfg)
    # Second load should hit the parquet cache and be identical.
    fd2 = load_finance_data(cfg)
    assert np.allclose(np.asarray(fd1.train), np.asarray(fd2.train))
    assert any(p.suffix == ".parquet" for p in tmp_path.iterdir())


# ---------------------------------------------------------------------------
# Real-data branch (synthetic=False): stub yfinance, reference-format frame
# ---------------------------------------------------------------------------


def _install_stub_yfinance(monkeypatch, frame):
    """Install a fake yfinance module whose download() returns `frame`
    (reference network boundary: data_finance.py:90-144)."""
    import sys
    import types

    calls = []

    def download(tickers, start=None, end=None, auto_adjust=None,
                 progress=None):
        calls.append({"tickers": tickers, "start": start, "end": end})
        return frame

    mod = types.ModuleType("yfinance")
    mod.download = download
    monkeypatch.setitem(sys.modules, "yfinance", mod)
    return calls


def _yf_style_frame(tickers, periods=900, seed=3):
    """Reference-format yfinance download result: MultiIndex columns
    (field, ticker) with NaN gaps, business-day index."""
    rng = np.random.default_rng(seed)
    dates = pd.bdate_range("2018-01-02", periods=periods)
    prices = 100.0 * np.exp(
        np.cumsum(rng.standard_normal((periods, len(tickers))) * 0.01, axis=0)
    )
    df = pd.DataFrame(prices, index=dates, columns=tickers)
    # Short NaN gaps (ffill-able) in one asset; a sparse asset that the
    # cleaning step must DROP (>10% missing).
    df.iloc[5:8, 0] = np.nan
    df.iloc[: periods // 5, -1] = np.nan
    cols = pd.MultiIndex.from_product([["Close"], tickers])
    out = pd.DataFrame(df.values, index=dates, columns=cols)
    return out


def test_real_data_branch_full_pipeline(monkeypatch, tmp_path):
    """synthetic=False end-to-end: stub download -> MultiIndex 'Close'
    extraction -> parquet cache -> clean (drops the sparse asset) ->
    stats -> splits -> a training batch."""
    from kmpc_tpu.data.finance import load_price_data

    tickers = ["AAA", "BBB", "CCC", "DDD"]
    frame = _yf_style_frame(tickers)
    calls = _install_stub_yfinance(monkeypatch, frame)

    cache = tmp_path / "real.parquet"
    prices = load_price_data(
        tickers, "2018-01-01", "2021-12-31",
        cache_path=cache, synthetic=False,
    )
    assert calls and calls[0]["tickers"] == tickers
    assert list(prices.columns) == tickers       # flattened to plain strings
    assert cache.exists()

    # Full downstream pipeline on the REAL-format (non-synthetic) frame,
    # via the parquet cache (second load must not call the network).
    cfg = _small_finance_cfg()
    cfg.ENV.FINANCE.TICKERS = tickers
    cfg.ENV.FINANCE.SYNTHETIC = False
    cfg.ENV.FINANCE.CACHE_DIR = str(tmp_path)
    # Stage the cache where load_finance_data will look for it.
    import hashlib

    digest = hashlib.md5(",".join(sorted(tickers)).encode()).hexdigest()[:8]
    prices.to_parquet(
        tmp_path / f"prices_2018-01-01_2021-12-31_{digest}.parquet"
    )
    n_calls = len(calls)
    fd = load_finance_data(cfg)
    assert len(calls) == n_calls                 # cache hit, no download
    # Sparse asset dropped by cleaning; NaN gaps ffilled.
    assert fd.n_assets == 3
    assert fd.metadata["tickers"] == ["AAA", "BBB", "CCC"]
    assert np.isfinite(np.asarray(fd.train)).all()
    assert fd.observation_size == 3 * cfg.ENV.FINANCE.EMBEDDING_DIM
    # Train a step on it (the branch feeds the same FinanceData surface).
    import jax

    win = fd.sample_batch(jax.random.PRNGKey(0), "train", 8, 2)
    assert win.shape == (8, 3, fd.observation_size)
    assert np.isfinite(np.asarray(win)).all()


def test_real_data_branch_single_ticker(monkeypatch, tmp_path):
    """Single-ticker downloads come back as a flat-column frame; the
    branch must wrap it into a one-column price frame."""
    from kmpc_tpu.data.finance import load_price_data

    rng = np.random.default_rng(0)
    dates = pd.bdate_range("2020-01-01", periods=50)
    flat = pd.DataFrame(
        {"Close": 50 + np.cumsum(rng.standard_normal(50))}, index=dates
    )
    _install_stub_yfinance(monkeypatch, flat)
    prices = load_price_data(["ONLY"], "2020-01-01", "2020-12-31",
                             synthetic=False)
    assert list(prices.columns) == ["ONLY"]
    assert prices.shape == (50, 1)


def test_download_stock_data_reference_surface(monkeypatch, tmp_path):
    """The named download_stock_data entry (reference:
    data_finance.py:90-144): cache-first behavior — the first call
    downloads and writes the parquet, the second call must serve the
    cache WITHOUT importing/touching yfinance at all, and both frames
    feed the downstream pipeline identically."""
    import sys

    from kmpc_tpu.data.finance import (
        clean_price_data,
        compute_log_returns,
        download_stock_data,
    )

    tickers = ["AAA", "BBB", "CCC", "DDD"]
    frame = _yf_style_frame(tickers)
    calls = _install_stub_yfinance(monkeypatch, frame)
    cache = tmp_path / "dl.parquet"

    prices1 = download_stock_data(tickers, "2018-01-01", "2021-12-31",
                                  cache_path=cache)
    assert len(calls) == 1 and cache.exists()

    # Second call: cache hit; yfinance must not even be importable.
    monkeypatch.delitem(sys.modules, "yfinance")
    prices2 = download_stock_data(tickers, "2018-01-01", "2021-12-31",
                                  cache_path=cache)
    pd.testing.assert_frame_equal(prices1, prices2, check_freq=False)

    # Identical downstream pipeline from either frame.
    r1 = compute_log_returns(clean_price_data(prices1))
    r2 = compute_log_returns(clean_price_data(prices2))
    pd.testing.assert_frame_equal(r1, r2, check_freq=False)
