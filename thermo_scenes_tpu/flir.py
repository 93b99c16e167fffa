"""Pure-Python FLIR MSX radiometric extractor.

Replacement for the reference's FlirImageExtractor git submodule
(thermo_scenes/flir_thermal_images/custom_flir.py:7, .gitmodules:1-3), which
shells out to the Perl ``exiftool`` binary. This module parses the FLIR FFF
container directly from the JPEG APP1 segments — no external tools:

  * JPEG APP1 segments tagged ``FLIR\\x00`` are concatenated into one FFF
    blob (observed layout verified against the reference's committed MSX
    fixtures tests/data/process_thermal/msx/IMG_06{20,22}.JPG).
  * The FFF directory (32-byte records, big-endian here; endianness detected
    from the header version field) locates:
      - RawData (type 0x01): 32-byte header + 16-bit PNG of raw sensor counts
      - CameraInfo (type 0x20): little-endian calibration block with the
        Planck constants (R1 0x58, B 0x5c, F 0x60, O 0x308, R2 0x30c),
        atmospheric fit coefficients (0x70..0x80) and scene parameters
        (emissivity 0x20, object distance 0x24, reflected/atmospheric/window
        temperatures 0x28/0x2c/0x30, IR window transmission 0x34, RH 0x3c)
      - EmbeddedImage (type 0x0e): the visible-light JPEG (MSX base photo)
  * ``raw2temp`` converts counts -> degC with the standard radiometric model
    (emissivity + reflection + two-pass atmospheric transmission + IR window
    terms), numerically matching flirimageextractor's implementation.

FLIR's embedded PNGs store 16-bit data little-endian, violating the PNG
spec; we detect the byte order by comparing against the RawValueMedian
calibration field and swap when needed.
"""

from __future__ import annotations

import dataclasses
import io
import struct
from pathlib import Path

import numpy as np
from PIL import Image


@dataclasses.dataclass
class FlirCalibration:
    emissivity: float
    object_distance: float
    reflected_temp_k: float
    atmospheric_temp_k: float
    ir_window_temp_k: float
    ir_window_transmission: float
    relative_humidity: float
    planck_r1: float
    planck_b: float
    planck_f: float
    planck_o: int
    planck_r2: float
    alpha1: float
    alpha2: float
    beta1: float
    beta2: float
    atx: float
    raw_value_median: int
    raw_value_range: int


@dataclasses.dataclass
class FlirImage:
    raw: np.ndarray  # [H, W] uint16 sensor counts
    thermal_c: np.ndarray  # [H, W] float64 degC
    visible: np.ndarray | None  # [H, W, 3] uint8 (embedded photo) or None
    calibration: FlirCalibration


def _jpeg_flir_segments(data: bytes) -> bytes:
    """Concatenate the FLIR APP1 payloads of a JPEG into one FFF blob."""
    i = 2
    chunks: list[bytes] = []
    n = len(data)
    while i < n - 4:
        if data[i] != 0xFF:
            break
        marker = data[i + 1]
        if marker in (0xD8, 0xD9):
            i += 2
            continue
        (length,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + length]
        if marker == 0xE1 and seg[:4] == b"FLIR":
            chunks.append(seg[8:])  # strip 'FLIR\0' + chunk index/count
        if marker == 0xDA:
            break
        i += 2 + length
    if not chunks:
        raise ValueError("no FLIR APP1 segments found (not an MSX radiometric JPEG?)")
    return b"".join(chunks)


def _parse_calibration(ci: bytes) -> FlirCalibration:
    f = lambda off: struct.unpack("<f", ci[off : off + 4])[0]
    return FlirCalibration(
        emissivity=f(0x20),
        object_distance=f(0x24),
        reflected_temp_k=f(0x28),
        atmospheric_temp_k=f(0x2C),
        ir_window_temp_k=f(0x30),
        ir_window_transmission=f(0x34),
        relative_humidity=f(0x3C),
        planck_r1=f(0x58),
        planck_b=f(0x5C),
        planck_f=f(0x60),
        planck_o=struct.unpack("<i", ci[0x308:0x30C])[0],
        planck_r2=f(0x30C),
        alpha1=f(0x70),
        alpha2=f(0x74),
        beta1=f(0x78),
        beta2=f(0x7C),
        atx=f(0x80),
        raw_value_median=struct.unpack("<H", ci[0x338:0x33A])[0],
        raw_value_range=struct.unpack("<H", ci[0x33C:0x33E])[0],
    )


def _decode_raw_png(record: bytes, median_hint: int) -> np.ndarray:
    """RawData record -> uint16 counts; fixes FLIR's little-endian PNG quirk."""
    png_start = record.find(b"\x89PNG")
    if png_start < 0:
        # uncompressed raw16 payload (older cameras): header then LE data
        (w,) = struct.unpack("<H", record[2:4])
        (h,) = struct.unpack("<H", record[4:6])
        return np.frombuffer(record[32 : 32 + w * h * 2], "<u2").reshape(h, w).copy()
    img = Image.open(io.BytesIO(record[png_start:]))
    arr = np.asarray(img)
    if arr.dtype != np.uint16:
        arr = arr.astype(np.uint16)
    swapped = arr.byteswap()
    # choose the interpretation whose median is closer to the calibration hint
    if median_hint > 0 and abs(int(np.median(swapped)) - median_hint) < abs(
        int(np.median(arr)) - median_hint
    ):
        return swapped
    return arr


def raw2temp(raw: np.ndarray, c: FlirCalibration) -> np.ndarray:
    """Sensor counts -> degC (standard FLIR radiometric model; same math as
    flirimageextractor.raw2temp)."""
    E = c.emissivity
    OD = c.object_distance
    RTemp = c.reflected_temp_k - 273.15
    ATemp = c.atmospheric_temp_k - 273.15
    IRWTemp = c.ir_window_temp_k - 273.15
    IRT = c.ir_window_transmission
    RH = c.relative_humidity * 100.0
    PR1, PB, PF, PO, PR2 = (
        c.planck_r1, c.planck_b, c.planck_f, float(c.planck_o), c.planck_r2,
    )
    ATA1, ATA2, ATB1, ATB2, ATX = c.alpha1, c.alpha2, c.beta1, c.beta2, c.atx

    emiss_wind = 1.0 - IRT
    refl_wind = 0.0
    h2o = (RH / 100.0) * np.exp(
        1.5587 + 0.06939 * ATemp - 0.00027816 * ATemp**2 + 0.00000068455 * ATemp**3
    )
    sq = np.sqrt(OD / 2.0)
    tau1 = ATX * np.exp(-sq * (ATA1 + ATB1 * np.sqrt(h2o))) + (1 - ATX) * np.exp(
        -sq * (ATA2 + ATB2 * np.sqrt(h2o))
    )
    tau2 = tau1

    def planck_raw(temp_c):
        return PR1 / (PR2 * (np.exp(PB / (temp_c + 273.15)) - PF)) - PO

    raw_refl1 = planck_raw(RTemp)
    raw_refl1_attn = (1 - E) / E * raw_refl1
    raw_atm1 = planck_raw(ATemp)
    raw_atm1_attn = (1 - tau1) / E / tau1 * raw_atm1
    raw_wind = planck_raw(IRWTemp)
    raw_wind_attn = emiss_wind / E / tau1 / IRT * raw_wind
    raw_refl2 = planck_raw(RTemp)
    raw_refl2_attn = refl_wind / E / tau1 / IRT * raw_refl2
    raw_atm2 = planck_raw(ATemp)
    raw_atm2_attn = (1 - tau2) / E / tau1 / IRT / tau2 * raw_atm2

    raw_obj = (
        raw.astype(np.float64) / E / tau1 / IRT / tau2
        - raw_atm1_attn
        - raw_atm2_attn
        - raw_wind_attn
        - raw_refl1_attn
        - raw_refl2_attn
    )
    return PB / np.log(PR1 / (PR2 * (raw_obj + PO)) + PF) - 273.15


def extract_flir(path: Path) -> FlirImage:
    """Parse one FLIR MSX JPEG into raw counts, degC map and visible photo."""
    data = Path(path).read_bytes()
    fff = _jpeg_flir_segments(data)
    if fff[:4] not in (b"FFF\x00", b"FFF\x01"):
        raise ValueError(f"unexpected FFF magic {fff[:4]!r}")
    # Detect directory endianness from a sane record count.
    for endian in (">", "<"):
        offs, cnt = struct.unpack(endian + "II", fff[24:32])
        if 0 < cnt < 256 and 0 < offs < len(fff):
            break
    else:
        raise ValueError("cannot parse FFF index header")

    raw_rec = None
    cal = None
    visible = None
    for k in range(cnt):
        e = fff[offs + 32 * k : offs + 32 * k + 32]
        if len(e) < 32:
            break
        etype, _sub = struct.unpack(endian + "HH", e[:4])
        eoff, elen = struct.unpack(endian + "II", e[12:20])
        rec = fff[eoff : eoff + elen]
        if etype == 0x01:  # RawData
            raw_rec = rec
        elif etype == 0x20:  # CameraInfo
            cal = _parse_calibration(rec)
        elif etype == 0x0E:  # EmbeddedImage (visible)
            j = rec.find(b"\xff\xd8\xff")
            if j >= 0:
                visible = np.asarray(
                    Image.open(io.BytesIO(rec[j:])).convert("RGB"), np.uint8
                )
    if raw_rec is None or cal is None:
        raise ValueError("FLIR file missing RawData or CameraInfo record")
    raw = _decode_raw_png(raw_rec, cal.raw_value_median)
    thermal = raw2temp(raw, cal)
    return FlirImage(raw=raw, thermal_c=thermal, visible=visible, calibration=cal)
