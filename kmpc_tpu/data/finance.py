"""Finance data pipeline: prices -> log-returns -> embedding -> splits.

TPU-native rebuild of the reference finance pipeline
(reference: data_finance.py:90-793). The math (log-returns,
train-only standardization, time-delay embedding, leak-free
chronological splits) preserves reference semantics exactly; the
surrounding machinery diverges on purpose:

- No torch Dataset/DataLoader. Splits are device arrays; training
  batches are gathered on-device from a permutation (one jittable
  gather per step) instead of a Python DataLoader loop
  (reference: data_finance.py:361-419, 638-670).
- The yfinance network boundary (reference: data_finance.py:90-144) is
  replaced by a deterministic seeded synthetic factor-model price panel
  plus the same parquet cache path, so the full pipeline runs with zero
  egress. If a cache file with real data exists it is used instead.
- Embedding is a vectorized stride construction, not a double Python
  loop (reference: data_finance.py:262-300).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from kmpc_tpu.config import Config, FinanceConfig, DEFAULT_FINANCE_TICKERS


# ---------------------------------------------------------------------------
# Synthetic price panel (replaces the yfinance download boundary)
# ---------------------------------------------------------------------------


def generate_synthetic_prices(
    tickers: List[str],
    start_date: str,
    end_date: str,
    seed: int = 1234,
) -> pd.DataFrame:
    """Deterministic factor-model price panel on business days.

    Each asset's daily log-return is a loading on a market factor plus a
    sector factor plus idiosyncratic noise, with per-asset drift/vol drawn
    from realistic ranges. Produces the same DataFrame contract as the
    reference's yfinance download (dates x tickers of positive prices,
    reference: data_finance.py:121-144) so the downstream pipeline is
    shared.
    """
    dates = pd.bdate_range(start=start_date, end=end_date)
    T, N = len(dates), len(tickers)
    rng = np.random.default_rng(seed)

    # Market factor with mild autocorrelated volatility (GARCH-ish).
    market = rng.standard_normal(T) * 0.009
    vol_state = np.ones(T)
    for t in range(1, T):
        vol_state[t] = 0.94 * vol_state[t - 1] + 0.06 * (1.0 + 4.0 * market[t - 1] ** 2 / 0.009**2 / 4.0)
    market = market * np.sqrt(vol_state)

    n_sectors = 5
    sector_factors = rng.standard_normal((T, n_sectors)) * 0.005
    sector_of = rng.integers(0, n_sectors, size=N)

    beta = rng.uniform(0.6, 1.4, size=N)
    drift = rng.uniform(0.0001, 0.0006, size=N)
    idio_vol = rng.uniform(0.006, 0.018, size=N)

    idio = rng.standard_normal((T, N)) * idio_vol[None, :]
    log_ret = drift[None, :] + beta[None, :] * market[:, None] + sector_factors[:, sector_of] + idio

    log_prices = np.log(rng.uniform(20.0, 400.0, size=N))[None, :] + np.cumsum(log_ret, axis=0)
    prices = np.exp(log_prices).astype(np.float64)
    return pd.DataFrame(prices, index=dates, columns=list(tickers))


def load_price_data(
    tickers: List[str],
    start_date: str,
    end_date: str,
    cache_path: Optional[Path] = None,
    synthetic: bool = True,
    synthetic_seed: int = 1234,
) -> pd.DataFrame:
    """Load prices from cache, else synthesize (or download when allowed).

    Cache contract matches the reference (parquet keyed by dates+tickers,
    reference: data_finance.py:112-143).
    """
    if cache_path is not None and Path(cache_path).exists():
        return pd.read_parquet(cache_path)

    if synthetic:
        prices = generate_synthetic_prices(tickers, start_date, end_date, seed=synthetic_seed)
    else:
        # Real-data branch (reference: data_finance.py:90-144). Network
        # egress happens only here; tests exercise it with a stub
        # yfinance module returning a reference-format frame.
        import yfinance as yf

        data = yf.download(tickers, start=start_date, end=end_date, auto_adjust=True, progress=False)
        prices = data["Close"] if len(tickers) > 1 else data["Close"].to_frame(name=tickers[0])
        prices.columns = [str(c) for c in prices.columns]

    if cache_path is not None:
        cache_path = Path(cache_path)
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        prices.to_parquet(cache_path)
    return prices


def download_stock_data(
    tickers: List[str],
    start_date: str,
    end_date: str,
    cache_path: Optional[Path] = None,
) -> pd.DataFrame:
    """Download adjusted close prices from Yahoo Finance — the
    reference's live market-data boundary, surface-for-surface
    (reference: data_finance.py:90-144): cache-first (parquet), lazy
    ``yfinance`` import so zero-egress environments never touch the
    network unless this function is explicitly called, single-ticker
    frame handling, and the same dates x tickers price-frame contract
    the rest of the pipeline consumes. ``load_finance_data`` stays on
    the deterministic synthetic panel by default
    (``FinanceConfig.SYNTHETIC=True``); flip ``SYNTHETIC=False`` (with a
    ``CACHE_DIR``) to route the full pipeline through this path.
    """
    return load_price_data(
        tickers, start_date, end_date,
        cache_path=cache_path, synthetic=False,
    )


# ---------------------------------------------------------------------------
# Core pure transforms (semantics match reference exactly)
# ---------------------------------------------------------------------------


def clean_price_data(
    prices: pd.DataFrame,
    max_missing_ratio: float = 0.1,
    max_gap_days: int = 5,
) -> pd.DataFrame:
    """Drop sparse assets, ffill short gaps, drop NaN rows
    (reference: data_finance.py:147-192)."""
    missing_ratios = prices.isna().mean()
    good_assets = missing_ratios[missing_ratios <= max_missing_ratio].index
    prices = prices[good_assets].copy()
    prices = prices.ffill(limit=max_gap_days)
    return prices.dropna()


def compute_log_returns(prices: pd.DataFrame) -> pd.DataFrame:
    """y_t = log(p_t) - log(p_{t-1}) (reference: data_finance.py:195-208)."""
    log_prices = np.log(prices)
    return log_prices.diff().iloc[1:]


@dataclass
class FinanceStats:
    """Per-asset standardization stats from training data only
    (reference: data_finance.py:71-83)."""

    mean: np.ndarray
    std: np.ndarray
    tickers: List[str]


def compute_standardization_stats(log_returns: pd.DataFrame, train_end: str) -> FinanceStats:
    """Mean/std over the training period only (reference: data_finance.py:211-240)."""
    train_data = log_returns[log_returns.index <= train_end]
    if len(train_data) == 0:
        raise ValueError(f"No training data before {train_end}")
    mean = train_data.mean().values
    std = np.maximum(train_data.std().values, 1e-8)
    return FinanceStats(mean=mean, std=std, tickers=list(log_returns.columns))


def standardize_returns(log_returns: pd.DataFrame, stats: FinanceStats) -> pd.DataFrame:
    """(y - mean) / std (reference: data_finance.py:243-259)."""
    return (log_returns - stats.mean) / stats.std


def time_delay_embedding(data: np.ndarray, embedding_dim: int) -> np.ndarray:
    """Y_t = [y_t, y_{t-1}, ..., y_{t-d+1}] flattened.

    Vectorized stride construction; identical layout to the reference's
    per-row loop (reference: data_finance.py:262-300): block j of the
    output row i holds data[i + d - 1 - j].
    """
    T, n_assets = data.shape
    d = embedding_dim
    if T < d:
        raise ValueError(f"Time series length {T} < embedding_dim {d}")
    n_embedded = T - d + 1
    # windows[i, j] = data[i + d - 1 - j]  for j = 0..d-1
    idx = (np.arange(n_embedded)[:, None] + (d - 1) - np.arange(d)[None, :])  # [n_embedded, d]
    return data[idx].reshape(n_embedded, d * n_assets)


def verify_embedding_shift(embedded: np.ndarray, n_assets: int, embedding_dim: int) -> bool:
    """Shift property Y_{t+1}[1:] == Y_t[:-1] (reference: data_finance.py:515-540)."""
    a = embedded[:-1].reshape(-1, embedding_dim, n_assets)[:, :-1]
    b = embedded[1:].reshape(-1, embedding_dim, n_assets)[:, 1:]
    return bool(np.allclose(a, b))


def create_finance_splits(
    log_returns: pd.DataFrame,
    stats: FinanceStats,
    train_end: str,
    val_end: str,
    embedding_dim: int,
) -> Tuple[np.ndarray, pd.DatetimeIndex, np.ndarray, pd.DatetimeIndex, np.ndarray, pd.DatetimeIndex]:
    """Leak-free chronological train/val/test splits with embedding
    (reference: data_finance.py:303-353)."""
    standardized = standardize_returns(log_returns, stats)
    data = standardized.values.astype(np.float32)
    dates = standardized.index

    embedded = time_delay_embedding(data, embedding_dim)
    embedded_dates = dates[embedding_dim - 1:]

    train_mask = embedded_dates <= train_end
    val_mask = (embedded_dates > train_end) & (embedded_dates <= val_end)
    test_mask = embedded_dates > val_end

    return (
        embedded[train_mask], embedded_dates[train_mask],
        embedded[val_mask], embedded_dates[val_mask],
        embedded[test_mask], embedded_dates[test_mask],
    )


def compute_return_stats(log_returns: pd.DataFrame) -> pd.DataFrame:
    """Summary statistics per asset (reference: data_finance.py:543-561)."""
    return pd.DataFrame(
        {
            "mean": log_returns.mean(),
            "std": log_returns.std(),
            "min": log_returns.min(),
            "max": log_returns.max(),
            "skew": log_returns.skew(),
            "kurtosis": log_returns.kurtosis(),
            "missing_ratio": log_returns.isna().mean(),
        }
    )


def compute_autocorrelation(log_returns: pd.DataFrame, lag: int = 1) -> pd.Series:
    """Per-asset autocorrelation (reference: data_finance.py:564-574)."""
    return log_returns.apply(lambda x: x.autocorr(lag=lag))


# ---------------------------------------------------------------------------
# FinanceData: device-resident splits + batch sampling
# ---------------------------------------------------------------------------


@dataclass
class FinanceData:
    """Device-array finance environment (replaces FinanceEnv + Datasets,
    reference: data_finance.py:361-419, 582-742).

    Splits are float32 device arrays [n_samples, obs_size]; batches are
    jittable gathers. Also carries standardization stats as device arrays
    so destandardization fuses into jitted programs.
    """

    train: jax.Array
    val: jax.Array
    test: jax.Array
    train_dates: pd.DatetimeIndex
    val_dates: pd.DatetimeIndex
    test_dates: pd.DatetimeIndex
    stats: FinanceStats
    metadata: Dict
    mean: jax.Array   # [n_assets]
    std: jax.Array    # [n_assets]
    sequence_length: int = 1

    @property
    def observation_size(self) -> int:
        return int(self.train.shape[1])

    @property
    def n_assets(self) -> int:
        return int(self.metadata["n_assets"])

    @property
    def embedding_dim(self) -> int:
        return int(self.metadata["embedding_dim"])

    def split(self, name: str) -> jax.Array:
        return {"train": self.train, "val": self.val, "test": self.test}[name]

    def num_examples(self, split: str, sequence_length: Optional[int] = None) -> int:
        """Number of start indices for pairs/sequences
        (reference: data_finance.py:387-394)."""
        L = self.sequence_length if sequence_length is None else sequence_length
        return int(self.split(split).shape[0]) - L

    def sample_batch(
        self,
        key: jax.Array,
        split: str = "train",
        batch_size: int = 64,
        sequence_length: Optional[int] = None,
    ) -> jax.Array:
        """Random batch of windows [B, L+1, obs] (L=1 gives pairs).

        Jittable: uniform random start indices + a strided gather. This is
        sampling-with-replacement per step, replacing the reference's
        shuffled epoch DataLoader (reference: data_finance.py:665-670) —
        statistically equivalent for SGD and far friendlier to a fixed
        compiled step.
        """
        L = self.sequence_length if sequence_length is None else sequence_length
        data = self.split(split)
        n = data.shape[0] - L
        if n <= 0:
            raise ValueError(
                f"Split '{split}' has {data.shape[0]} rows — too short for "
                f"sequence_length {L} (reference: data_finance.py:391-394)"
            )
        starts = jax.random.randint(key, (batch_size,), 0, n)
        idx = starts[:, None] + jnp.arange(L + 1)[None, :]  # [B, L+1]
        return data[idx]

    def batch_at(self, start_indices: jax.Array, split: str, sequence_length: int) -> jax.Array:
        """Deterministic windows for eval: [B, L+1, obs]."""
        data = self.split(split)
        idx = start_indices[:, None] + jnp.arange(sequence_length + 1)[None, :]
        return data[idx]

    def get_test_sequences(
        self, num_sequences: int = 100, max_length: int = 200
    ) -> Tuple[jax.Array, jax.Array]:
        """Evenly spaced test windows: (init [B, obs], future [L, B, obs])
        (reference: data_finance.py:672-715)."""
        test = self.test
        n_samples = test.shape[0]
        actual_length = min(max_length, n_samples - 1)
        actual_num = min(num_sequences, n_samples - actual_length)
        if actual_num <= 0:
            raise ValueError(
                f"Not enough test data for {num_sequences} sequences of length {max_length}"
            )
        step = (n_samples - actual_length) // actual_num
        starts = jnp.arange(actual_num) * step
        init = test[starts]                                            # [B, obs]
        idx = starts[:, None] + 1 + jnp.arange(actual_length)[None, :]  # [B, L]
        future = jnp.swapaxes(test[idx], 0, 1)                         # [L, B, obs]
        return init, future

    def extract_current_returns(self, observations: jax.Array) -> jax.Array:
        """First n_assets block of the embedding = y_t
        (reference: data_finance.py:717-729)."""
        return observations[..., : self.n_assets]

    def destandardize_returns(self, standardized: jax.Array) -> jax.Array:
        """Back to raw log-return scale (reference: data_finance.py:731-742)."""
        return standardized * self.std + self.mean


def load_finance_data(
    cfg_or_finance: Optional[Config | FinanceConfig] = None,
    sequence_length: Optional[int] = None,
) -> FinanceData:
    """Main entry: load/synthesize prices and build FinanceData
    (reference: data_finance.py:427-507, 745-792)."""
    if cfg_or_finance is None:
        fin = FinanceConfig()
        seq_len = 1 if sequence_length is None else sequence_length
    elif isinstance(cfg_or_finance, Config):
        cfg = cfg_or_finance
        fin = cfg.ENV.FINANCE
        if sequence_length is None:
            seq_len = cfg.TRAIN.SEQUENCE_LENGTH if cfg.TRAIN.USE_SEQUENCE_LOSS else 1
        else:
            seq_len = sequence_length
    else:
        fin = cfg_or_finance
        seq_len = 1 if sequence_length is None else sequence_length

    cache_path = None
    if fin.CACHE_DIR is not None:
        # Deterministic digest: Python's builtin hash() is salted per
        # process, which would make the cache unreachable on the next run
        # (and silently fall back to synthetic data when a user staged
        # REAL prices at the cache path). The reference has this bug
        # (data_finance.py:451); not replicated.
        import hashlib

        ticker_hash = hashlib.md5(
            ",".join(sorted(fin.TICKERS)).encode()
        ).hexdigest()[:8]
        cache_path = Path(fin.CACHE_DIR) / (
            f"prices_{fin.START_DATE}_{fin.END_DATE}_{ticker_hash}.parquet"
        )

    prices = load_price_data(
        tickers=fin.TICKERS,
        start_date=fin.START_DATE,
        end_date=fin.END_DATE,
        cache_path=cache_path,
        synthetic=fin.SYNTHETIC,
        synthetic_seed=fin.SYNTHETIC_SEED,
    )
    prices = clean_price_data(prices)
    log_returns = compute_log_returns(prices)
    stats = compute_standardization_stats(log_returns, fin.TRAIN_END)
    train, train_dates, val, val_dates, test, test_dates = create_finance_splits(
        log_returns, stats, fin.TRAIN_END, fin.VAL_END, fin.EMBEDDING_DIM
    )

    metadata = {
        "tickers": list(log_returns.columns),
        "n_assets": len(log_returns.columns),
        "embedding_dim": fin.EMBEDDING_DIM,
        "observation_size": train.shape[1],
        "train_samples": max(len(train) - seq_len, 0),
        "val_samples": max(len(val) - seq_len, 0),
        "test_samples": max(len(test) - seq_len, 0),
        "train_date_range": (str(train_dates[0].date()), str(train_dates[-1].date())),
        "val_date_range": (str(val_dates[0].date()), str(val_dates[-1].date())),
        "test_date_range": (str(test_dates[0].date()), str(test_dates[-1].date())),
        "prices_shape": tuple(prices.shape),
        "log_returns_shape": tuple(log_returns.shape),
    }

    return FinanceData(
        train=jnp.asarray(train),
        val=jnp.asarray(val),
        test=jnp.asarray(test),
        train_dates=train_dates,
        val_dates=val_dates,
        test_dates=test_dates,
        stats=stats,
        metadata=metadata,
        mean=jnp.asarray(stats.mean, dtype=jnp.float32),
        std=jnp.asarray(stats.std, dtype=jnp.float32),
        sequence_length=seq_len,
    )


# Alias matching the reference factory name (reference: data_finance.py:745).
create_finance_env = load_finance_data
