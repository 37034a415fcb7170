"""KV metric logger + lightweight profiling.

Rebuild of ``improved_diffusion/logger.py`` (OpenAI-baselines port, 495 LoC):
``logkv``/``logkv_mean``/``dumpkvs`` with human/JSON/CSV/TensorBoard output
formats, process-rank-aware file suffixes, and the ``profile_kv`` context
manager / ``@profile`` decorator accumulating ``wait_<name>`` wall-times
(reference ``logger.py:294-307``).
"""

from __future__ import annotations

import contextlib
import csv
import functools
import json
import os
import time
from collections import defaultdict
from typing import Optional


class HumanOutputFormat:
    def __init__(self, path_or_file):
        self.own = isinstance(path_or_file, str)
        self.f = open(path_or_file, "at") if self.own else path_or_file

    def writekvs(self, kvs):
        key2str = {str(k): f"{v:<8.3g}" if hasattr(v, "__float__") else str(v) for k, v in sorted(kvs.items())}
        if not key2str:
            return
        keywidth = max(map(len, key2str))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for k, v in sorted(key2str.items()):
            lines.append(f"| {k}{' ' * (keywidth - len(k))} | {v}{' ' * (valwidth - len(v))} |")
        lines.append(dashes)
        self.f.write("\n".join(lines) + "\n")
        self.f.flush()

    def close(self):
        if self.own:
            self.f.close()


class JSONOutputFormat:
    def __init__(self, path):
        self.f = open(path, "at")

    def writekvs(self, kvs):
        self.f.write(json.dumps({k: float(v) if hasattr(v, "__float__") else v for k, v in kvs.items()}) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class CSVOutputFormat:
    def __init__(self, path):
        self.path = path
        self.keys = []

    def writekvs(self, kvs):
        extra = sorted(set(kvs) - set(self.keys))
        if extra:
            self.keys += extra
            rows = []
            if os.path.exists(self.path):
                with open(self.path) as f:
                    rows = list(csv.DictReader(f))
            with open(self.path, "wt", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self.keys)
                w.writeheader()
                for r in rows:
                    w.writerow(r)
        with open(self.path, "at", newline="") as f:
            csv.DictWriter(f, fieldnames=self.keys).writerow({k: kvs.get(k, "") for k in self.keys})

    def close(self):
        pass


class TensorBoardOutputFormat:
    def __init__(self, logdir):
        from torch.utils.tensorboard import SummaryWriter  # torch cpu wheel provides this

        self.writer = SummaryWriter(logdir)
        self.step = 0

    def writekvs(self, kvs):
        step = int(kvs.get("step", self.step))
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                self.writer.add_scalar(k, float(v), step)
        self.writer.flush()
        self.step += 1

    def close(self):
        self.writer.close()


def make_output_format(fmt: str, ev_dir: str, log_suffix: str = ""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        import sys

        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(os.path.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(os.path.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format specified: {fmt}")


class Logger:
    CURRENT: Optional["Logger"] = None

    def __init__(self, dir: str, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + float(val) / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        out = dict(self.name2val)
        for fmt in self.output_formats:
            fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def configure(dir: Optional[str] = None, format_strs=None, log_suffix: str = "") -> Logger:
    dir = dir or os.environ.get("LOGDIR") or os.path.join("/tmp", f"admd-{time.strftime('%Y%m%d-%H%M%S')}")
    if format_strs is None:
        import jax

        rank = jax.process_index()
        if rank == 0:
            format_strs = os.environ.get("LOG_FORMAT", "stdout,log,csv").split(",")
        else:
            format_strs = os.environ.get("LOG_FORMAT_MPI", "log").split(",")
            log_suffix = log_suffix or f"-rank{rank:03d}"
    formats = [make_output_format(f, dir, log_suffix) for f in format_strs if f]
    Logger.CURRENT = Logger(dir, formats)
    return Logger.CURRENT


def get_current() -> Logger:
    if Logger.CURRENT is None:
        configure()
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def dumpkvs():
    return get_current().dumpkvs()


def log_loss_dict(num_timesteps: int, ts, losses: dict):
    """Per-quartile diffusion-loss logging (reference ``train_util.py:360-366``)."""
    import numpy as np

    ts = np.asarray(ts)
    for key, values in losses.items():
        values = np.asarray(values)
        logkv_mean(key, values.mean())
        for t, v in zip(ts, values):
            quartile = int(4 * t / num_timesteps)
            logkv_mean(f"{key}_q{quartile}", v)


# ------------------------------------------------------------- profiling

_profile_totals = defaultdict(float)


@contextlib.contextmanager
def profile_kv(scopename: str):
    t0 = time.time()
    try:
        yield
    finally:
        elapsed = time.time() - t0
        _profile_totals[scopename] += elapsed
        get_current().name2val[f"wait_{scopename}"] = _profile_totals[scopename]


def profile(scopename: str):
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with profile_kv(scopename):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace scope (SURVEY.md §5.1 TPU equivalent of the
    reference's CUDA-event timing): view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
