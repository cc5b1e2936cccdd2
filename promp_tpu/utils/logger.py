"""Key-value logger: stdout table / log file / CSV / JSON + snapshots.

Fresh implementation of the reference logger's behavior contract
(reference: meta_policy_search/utils/logger.py, itself derived from
openai/baselines): ``logkv / logkv_mean / dumpkvs`` (:204-246), writer
formats stdout/log/csv/json (:38-197), ``ProfileKV``/``profile`` timing
helpers accumulating ``wait_<name>`` keys (:287-311), and
``save_itr_params`` snapshot modes last/all/gap/last_gap/none (:376-396).
Multi-host runs suffix per-process files with the JAX process index —
the analog of the reference's MPI-rank suffixing (:401-427).
"""
from __future__ import annotations

import csv as _csv
import datetime
import functools
import json
import os
import os.path as osp
import pickle
import sys
import time
from collections import defaultdict

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError

    def close(self):
        pass


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    """Boxed stdout/logfile table (reference logger.py:44-91)."""

    def __init__(self, file):
        self.file = file
        self.own_file = isinstance(file, str)
        if self.own_file:
            self.file = open(file, "wt")  # reference logger.py:41

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f"{val:<8.3g}" if hasattr(val, "__float__") else str(val)
            key2str[self._truncate(key)] = self._truncate(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in key2str.items():
            lines.append(f"| {key}{' ' * (keywidth - len(key))} | "
                         f"{val}{' ' * (valwidth - len(val))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _truncate(s, maxlen=30):
        return s[:maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "wt")  # reference logger.py:98

    def writekvs(self, kvs):
        out = {}
        for k, v in kvs.items():
            if hasattr(v, "dtype"):
                v = float(v)
            out[k] = v
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    """progress.csv with growing header (reference logger.py:109-140)."""

    def __init__(self, filename):
        self.filename = filename
        self.file = open(filename, "w+t")  # reference logger.py:114
        self.keys = []

    def writekvs(self, kvs):
        extra_keys = [k for k in kvs.keys() if k not in self.keys]
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.truncate()
            writer = _csv.writer(self.file)
            writer.writerow(self.keys)
            for line in lines[1:]:
                self.file.write(line.rstrip("\n"))
                self.file.write("," * len(extra_keys) + "\n")
        writer = _csv.writer(self.file)
        writer.writerow(["" if kvs.get(k) is None else
                         (float(kvs[k]) if hasattr(kvs[k], "dtype") else kvs[k])
                         for k in self.keys])
        self.file.flush()

    def close(self):
        self.file.close()


_CRC32C_TABLE = None


def _crc32c(data):
    """CRC-32C (Castagnoli), table-driven — needed by the TFRecord
    framing of TensorBoard event files."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


def _pb_varint(v):
    out = bytearray()
    while True:
        bits = v & 0x7F
        v >>= 7
        if v:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _pb_bytes(field_num, payload):
    return _pb_varint((field_num << 3) | 2) + _pb_varint(len(payload)) \
        + payload


class TensorBoardOutputFormat(KVWriter):
    """TensorBoard scalar event files, dependency-free.

    The reference's TB writer (reference logger.py:148-195) drives TF1's
    pywrap EventsWriter; this build has no TensorFlow, so the Event /
    Summary protobuf messages and the TFRecord record framing (length +
    masked CRC-32C) are hand-encoded — ~40 scalars per iteration, so the
    pure-Python CRC is nowhere near any hot path. Readable by standard
    TensorBoard (`tensorboard --logdir <dir>`).
    """

    def __init__(self, dirname):
        os.makedirs(dirname, exist_ok=True)
        import socket
        path = osp.join(dirname,
                        f"events.out.tfevents.{int(time.time())}."
                        f"{socket.gethostname()}")
        self.file = open(path, "wb")
        self.step = 0
        # header event: file_version (Event field 3) = "brain.Event:2"
        self._write_event(_pb_bytes(3, b"brain.Event:2"))

    def _write_event(self, payload):
        import struct
        # wall_time: Event field 1, wire type 1 (double)
        payload = (_pb_varint(1 << 3 | 1) + struct.pack("<d", time.time())
                   + payload)
        header = struct.pack("<Q", len(payload))
        self.file.write(header)
        self.file.write(struct.pack("<I", _masked_crc(header)))
        self.file.write(payload)
        self.file.write(struct.pack("<I", _masked_crc(payload)))
        self.file.flush()

    def writekvs(self, kvs):
        import struct
        step = int(kvs.get("Itr", self.step))
        values = b""
        for k, v in sorted(kvs.items()):
            try:
                fv = float(v)
            except (TypeError, ValueError):
                continue
            value_msg = (_pb_bytes(1, str(k).encode())
                         + _pb_varint(2 << 3 | 5)
                         + struct.pack("<f", fv))
            values += _pb_bytes(1, value_msg)
        event = (_pb_varint(2 << 3) + _pb_varint(step)   # step int64
                 + _pb_bytes(5, values))                  # summary
        self._write_event(event)
        self.step = step + 1

    def close(self):
        self.file.close()


def make_output_format(fmt, ev_dir, log_suffix=""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format {fmt!r}")


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, output_formats, snapshot_mode="last",
                 snapshot_gap=10):
        self.name2val = {}
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats
        self.snapshot_mode = snapshot_mode
        self.snapshot_gap = snapshot_gap
        self._ckpt_writer = None  # lazily-built AsyncCheckpointWriter
        self._last_ckpt_seq = 0

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        if val is None:
            self.name2val[key] = None
            return
        oldval, cnt = self.name2val.get(key, 0), self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def save_itr_params(self, itr, params):
        """Snapshot save with mode semantics of reference logger.py:376-396."""
        if not self.dir:
            return
        mode = self.snapshot_mode
        if mode == "all":
            path = osp.join(self.dir, f"itr_{itr}.pkl")
        elif mode == "last":
            path = osp.join(self.dir, "params.pkl")
        elif mode == "gap":
            if itr % self.snapshot_gap != 0:
                return
            path = osp.join(self.dir, f"itr_{itr}.pkl")
        elif mode == "last_gap":
            if itr % self.snapshot_gap != 0:
                return
            path = osp.join(self.dir, "params.pkl")
        elif mode in ("none", None):
            return
        else:
            raise ValueError(f"Invalid snapshot mode {mode!r}")
        # serialize on the caller, hand bytes to the async durable writer
        # (runtime/ckptwriter.cpp): fsync + atomic rename off-thread, so
        # snapshot IO never stalls the device-feeding loop (the reference
        # writes joblib pickles inline, logger.py:376-396)
        blob = pickle.dumps(params, protocol=pickle.HIGHEST_PROTOCOL)
        if self._ckpt_writer is None:
            from promp_tpu.utils.native import AsyncCheckpointWriter
            self._ckpt_writer = AsyncCheckpointWriter()
        self._last_ckpt_seq = self._ckpt_writer.submit(path, blob)

    def sync_snapshots(self, timeout_s=300.0):
        """Block until every submitted snapshot is durable on disk."""
        if self._ckpt_writer is not None:
            return self._ckpt_writer.wait(self._last_ckpt_seq, timeout_s)
        return True

    def close(self):
        for fmt in self.output_formats:
            fmt.close()
        if self._ckpt_writer is not None:
            self._ckpt_writer.close()
            self._ckpt_writer = None


def configure(dir=None, format_strs=None, snapshot_mode="last",
              snapshot_gap=10):
    if dir is None:
        dir = os.getenv("PROMP_TPU_LOGDIR") or osp.join(
            "/tmp", datetime.datetime.now().strftime(
                "promp-tpu-%Y-%m-%d-%H-%M-%S-%f"))
    os.makedirs(dir, exist_ok=True)

    # per-host file suffix, the analog of MPI rank suffixing
    # (reference logger.py:411-422)
    log_suffix = ""
    try:
        import jax
        if jax.process_count() > 1:
            log_suffix = f"-rank{jax.process_index():03d}"
    except Exception:
        pass

    if format_strs is None:
        format_strs = ["stdout", "log", "csv"]
    output_formats = [make_output_format(f, dir, log_suffix)
                      for f in format_strs]
    Logger.CURRENT = Logger(dir, output_formats, snapshot_mode, snapshot_gap)
    log(f"Logging to {dir}")
    return dir


def _get():
    if Logger.CURRENT is None:
        Logger.CURRENT = Logger(None, [HumanOutputFormat(sys.stdout)])
    return Logger.CURRENT


def logkv(key, val):
    _get().logkv(key, val)


def logkv_mean(key, val):
    _get().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    _get().dumpkvs()


def log(*args, level=INFO):
    _get().log(*args, level=level)


def save_itr_params(itr, params):
    _get().save_itr_params(itr, params)


def sync_snapshots(timeout_s=300.0):
    return _get().sync_snapshots(timeout_s)


def get_dir():
    return _get().dir


class ProfileKV:
    """``with ProfileKV(name)``: accumulate wall time under ``wait_<name>``
    (reference logger.py:287-303)."""

    def __init__(self, name):
        self.name = "wait_" + name

    def __enter__(self):
        self.start = time.time()

    def __exit__(self, *args):
        _get().name2val[self.name] = (
            _get().name2val.get(self.name, 0.0) + time.time() - self.start)


def profile(name):
    """Decorator form of ProfileKV (reference logger.py:305-311)."""
    def deco(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with ProfileKV(name):
                return func(*args, **kwargs)
        return wrapper
    return deco
