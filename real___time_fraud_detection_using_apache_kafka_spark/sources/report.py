"""S11 report artifacts: PNG chart rendering with ZERO dependencies.

The reference saves three matplotlib/seaborn figures per model —
confusion-matrix heatmap, metrics bar chart, feature-importance bars
(``FD/model.py:157-198``) — plus a text classification report.  This
module reproduces the artifacts from the engine's aggregates using a
minimal pure-stdlib PNG encoder (``zlib`` + ``struct``): the matplotlib
stack is deliberately NOT a dependency of a query engine, and the
inputs are always metadata-sized driver-side values (a 2x2 confusion
table, ~10 metrics, top-k importances) — exactly like the reference,
which also renders driver-side after the distributed work is done.

Pixels are written as 8-bit RGB scanlines (filter 0), one IDAT chunk.
The renderers draw axis-free block charts — honest, readable, and
byte-deterministic (same input -> same file), which the tests assert.
"""

from __future__ import annotations

import struct
import zlib


# --------------------------------------------------------------- raster --
class Raster:
    """Tiny RGB canvas with rect fills, rendered to PNG bytes."""

    def __init__(self, width: int, height: int,
                 bg: tuple[int, int, int] = (255, 255, 255)):
        self.w, self.h = int(width), int(height)
        self.pix = bytearray(bg * self.w * self.h)

    def fill_rect(self, x0: int, y0: int, x1: int, y1: int,
                  rgb: tuple[int, int, int]) -> None:
        x0, x1 = max(0, min(x0, x1)), min(self.w, max(x0, x1))
        y0, y1 = max(0, min(y0, y1)), min(self.h, max(y0, y1))
        row = bytes(rgb) * (x1 - x0)
        for y in range(y0, y1):
            off = 3 * (y * self.w + x0)
            self.pix[off:off + 3 * (x1 - x0)] = row

    def png_bytes(self) -> bytes:
        def chunk(tag: bytes, payload: bytes) -> bytes:
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload)))

        raw = b"".join(
            b"\x00" + bytes(self.pix[3 * y * self.w: 3 * (y + 1) * self.w])
            for y in range(self.h)
        )
        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 9))
                + chunk(b"IEND", b""))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.png_bytes())


def _heat(v: float) -> tuple[int, int, int]:
    """0..1 -> light-to-dark blue, the heatmap ramp."""
    v = 0.0 if v != v else max(0.0, min(1.0, v))  # NaN -> 0
    return (int(235 - 190 * v), int(240 - 170 * v), 255 - int(55 * v))


_BAR = (66, 120, 224)
_GRID = (210, 210, 210)
_PAD = 20


# ------------------------------------------------------------ renderers --
def confusion_matrix_png(cells: dict[tuple[int, int], int], path: str,
                         size: int = 360) -> None:
    """Heatmap of the 2x2 (or NxN) confusion table.  ``cells`` maps
    (actual, predicted) -> count — the driver-side result of the
    engine's confusion aggregate (A8)."""
    labels = sorted({a for a, _ in cells} | {p for _, p in cells})
    n = max(len(labels), 1)
    top = max(cells.values(), default=1) or 1
    img = Raster(size, size)
    cell = (size - 2 * _PAD) // n
    for i, a in enumerate(labels):
        for j, p in enumerate(labels):
            v = cells.get((a, p), 0) / top
            x0 = _PAD + j * cell
            y0 = _PAD + i * cell
            img.fill_rect(x0 + 1, y0 + 1, x0 + cell - 1, y0 + cell - 1,
                          _heat(v))
    img.save(path)


def metrics_bar_png(metrics: dict[str, float], path: str,
                    width: int = 560, height: int = 360) -> None:
    """Vertical bar chart of the metric battery, y-axis pinned to
    [0, 1] like the reference's ``ax.set_ylim(0, 1)``."""
    img = Raster(width, height)
    n = max(len(metrics), 1)
    span = (width - 2 * _PAD) // n
    floor = height - _PAD
    ceil_y = _PAD
    img.fill_rect(_PAD, floor, width - _PAD, floor + 2, _GRID)
    for i, (_, v) in enumerate(sorted(metrics.items())):
        v = 0.0 if v != v else max(0.0, min(1.0, float(v)))
        h = int((floor - ceil_y) * v)
        x0 = _PAD + i * span
        img.fill_rect(x0 + 2, floor - h, x0 + span - 2, floor, _BAR)
    img.save(path)


def feature_importance_png(pairs: list[tuple[str, float]], path: str,
                           width: int = 560, height: int = 360) -> None:
    """Horizontal top-k importance bars (descending), mirroring the
    reference's ``nlargest(10).plot(kind='barh')``."""
    pairs = sorted(pairs, key=lambda kv: -kv[1])[:10]
    top = max((v for _, v in pairs), default=1.0) or 1.0
    img = Raster(width, height)
    n = max(len(pairs), 1)
    span = (height - 2 * _PAD) // n
    for i, (_, v) in enumerate(pairs):
        w = int((width - 2 * _PAD) * max(0.0, float(v)) / top)
        y0 = _PAD + i * span
        img.fill_rect(_PAD, y0 + 2, _PAD + w, y0 + span - 2, _BAR)
    img.save(path)


def classification_report_txt(per_class: list[dict], path: str) -> None:
    """sklearn-style text classification report from the engine's
    ``per_class_report`` rows (label, precision, recall, f1, support)."""
    lines = [f"{'label':>12} {'precision':>10} {'recall':>10} "
             f"{'f1-score':>10} {'support':>10}"]
    for row in per_class:
        lines.append(
            f"{str(row['label']):>12} {row['precision']:>10.4f} "
            f"{row['recall']:>10.4f} {row['f1']:>10.4f} "
            f"{int(row['support']):>10d}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
