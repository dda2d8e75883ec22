"""Image <-> OFDM conversion + image-backed training dataset.

Behavioral parity targets:
  * reference utils/ofdm_utils.py:839-1024 (ImageOFDMConverter): image ->
    grayscale -> bits (unpackbits) -> QAM -> OFDM -> pad/truncate to
    ``frame_length`` -> [2, L] I/Q + max-abs normalization; inverse path
    back to pixels.
  * reference utils/dataset.py:38-182 (OFDMDataset): per-image clean-signal
    cache, ``samples_per_image`` noisy variants per image at random SNR,
    joint renormalization of each (noisy, clean) pair.

TPU-native split: image decode (PIL) and bit packing happen once on the
host; the per-sample channel simulation runs batched on device from cached
clean frames.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.iq import complex_to_iq, iq_to_complex, joint_max_normalize
from . import channel as channel_lib
from . import ofdm, qam


@dataclasses.dataclass(frozen=True)
class ImageOFDMConfig:
    modulation: str = "QAM16"
    n_subcarriers: int = 64
    cp_length: int = 16
    frame_length: int = 1024


def to_grayscale(image: np.ndarray) -> np.ndarray:
    """RGB -> luma (0.299/0.587/0.114), uint8 (ofdm_utils.py:902-905)."""
    if image.ndim == 3:
        image = np.dot(image[..., :3], [0.299, 0.587, 0.114]).astype(np.uint8)
    return image


def image_to_ofdm(
    image: np.ndarray, cfg: ImageOFDMConfig = ImageOFDMConfig(), normalize: bool = True,
    truncate: bool = True,
) -> Tuple[np.ndarray, Dict]:
    """Image -> channels-last I/Q frame ``[L, 2]`` + metadata
    (ofdm_utils.py:885-949; note the reference returns [2, L] — convert with
    utils.iq.nlc_to_ncl when reference layout is needed).

    ``truncate=False`` keeps the FULL modulated signal (still zero-padded up
    to at least ``frame_length``) instead of the reference's truncate-to-
    frame_length rule — used by the chunk dataset below."""
    image = to_grayscale(np.asarray(image))
    pixels = image.flatten().astype(np.uint8)
    bits = np.unpackbits(pixels)

    spec = ofdm.OFDMSpec(cfg.n_subcarriers, cfg.cp_length)
    symbols = qam.modulate(jnp.asarray(bits), cfg.modulation)
    signal = np.asarray(ofdm.modulate(symbols, spec))

    if len(signal) < cfg.frame_length:
        signal = np.pad(signal, (0, cfg.frame_length - len(signal)))
    elif truncate:
        signal = signal[: cfg.frame_length]

    iq = np.asarray(complex_to_iq(jnp.asarray(signal)), np.float32)  # [L, 2]
    max_val = float(np.max(np.abs(iq))) if normalize else 1.0
    if normalize and max_val > 0:
        iq = iq / max_val
    metadata = {
        "original_shape": tuple(image.shape),
        "n_pixels": int(pixels.size),
        "n_bits": int(bits.size),
        "n_qam_symbols": int(symbols.shape[-1]),
        "signal_length": int(len(signal)),
        "normalization_factor": max_val if normalize else 1.0,
    }
    return iq, metadata


def ofdm_to_image(
    iq: np.ndarray,
    original_shape: Tuple[int, ...],
    cfg: ImageOFDMConfig = ImageOFDMConfig(),
    denormalize_factor: float = 1.0,
) -> np.ndarray:
    """Inverse path: I/Q ``[L, 2]`` -> demod -> bits -> pixels
    (ofdm_utils.py:951-998)."""
    signal = np.asarray(iq_to_complex(jnp.asarray(iq * denormalize_factor)))
    spec = ofdm.OFDMSpec(cfg.n_subcarriers, cfg.cp_length)
    symbols, _ = ofdm.demodulate(jnp.asarray(signal), spec)
    bits = np.asarray(qam.demodulate(symbols, cfg.modulation))

    n_pixels = int(np.prod(original_shape))
    n_bits = n_pixels * 8
    if bits.size >= n_bits:
        bits = bits[:n_bits]
    else:
        bits = np.concatenate([bits, np.zeros(n_bits - bits.size, int)])
    pixels = np.packbits(bits.astype(np.uint8))[:n_pixels]
    return pixels.reshape(original_shape)


def load_image(path: str, max_pixels: int = 4096) -> np.ndarray:
    """Grayscale image loader with the reference's resize rule
    (utils/dataset.py:169-182)."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    if img.size[0] * img.size[1] > max_pixels:
        img = img.resize((64, 64), Image.Resampling.LANCZOS)
    return np.array(img)


class ImageOFDMDataset:
    """Image-backed training data (reference OFDMDataset, utils/dataset.py:38-182).

    Clean frames are derived once per image (host) and cached on device;
    ``sample_batch`` then draws random (image, SNR) pairs and runs the
    channel on device in one fused call.
    """

    EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tiff")

    def __init__(
        self,
        image_dir: str,
        frame_length: int = 16,
        modulation: str = "QPSK",
        n_subcarriers: int = 8,
        cp_length: int = 2,
        snr_range: Tuple[float, float] = (0, 30),
        channel_type: str = "awgn",
        samples_per_image: int = 10,
    ):
        self.cfg = ImageOFDMConfig(modulation, n_subcarriers, cp_length, frame_length)
        self.snr_range = snr_range
        self.channel = channel_lib.ChannelConfig(channel_type)
        self.samples_per_image = samples_per_image
        self.image_files = self._find_images(Path(image_dir))
        if not self.image_files:
            raise FileNotFoundError(f"no images under {image_dir}")
        cleans, factors = [], []
        # per-image conversion is a host-side preprocessing pass — pin it to
        # the CPU backend (eager dispatch on the TPU backend stalls)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            for p in self.image_files:
                iq, meta = image_to_ofdm(load_image(str(p)), self.cfg)
                cleans.append(np.asarray(iq))
                factors.append(meta["normalization_factor"])
        self._clean = jnp.asarray(np.stack(cleans))          # [n_img, L, 2]
        self._factors = jnp.asarray(np.asarray(factors, np.float32))

    def _find_images(self, d: Path) -> List[Path]:
        files: List[Path] = []
        if d.exists():
            for ext in self.EXTENSIONS:
                files += list(d.glob(f"*{ext}")) + list(d.glob(f"*{ext.upper()}"))
        return sorted(files)

    def __len__(self) -> int:
        return len(self.image_files) * self.samples_per_image

    def sample_batch(self, key: jax.Array, batch_size: int) -> Dict[str, jnp.ndarray]:
        """Fused device-side sampling: pick images, denormalize to the
        physical signal, apply the channel at random SNR, renormalize
        jointly (utils/dataset.py:112-167)."""
        k_img, k_snr, k_ch = jax.random.split(key, 3)
        idx = jax.random.randint(k_img, (batch_size,), 0, self._clean.shape[0])
        clean_iq = self._clean[idx]
        clean_c = iq_to_complex(clean_iq) * self._factors[idx][:, None]
        snr = jax.random.uniform(k_snr, (batch_size,), jnp.float32, *self.snr_range)
        noisy_c, _ = channel_lib.apply(k_ch, clean_c, snr, self.channel)
        noisy_iq = complex_to_iq(noisy_c).astype(jnp.float32)
        noisy_iq, clean_out = joint_max_normalize(noisy_iq, clean_iq)
        return {"noisy": noisy_iq, "clean": clean_out, "snr": snr}


class ImageOFDMChunkDataset:
    """Chunk-level training data matched to the image-transmission protocol.

    ``viz.image_transmission.ImageOFDMSimulator`` transmits each image as one
    long QAM16/64-subcarrier OFDM signal and enhances it in ``gen_frame``
    (16-sample) chunks, normalizing each chunk by its own NOISY max
    (image_transmission.py:_enhance). ``ImageOFDMDataset`` above (the
    reference's training distribution) instead truncates every image to its
    FIRST 16 samples and joint-normalizes — so a model trained on it is out
    of distribution for the simulator. This dataset samples uniformly over
    ALL aligned chunks of the full modulated signals, adds AWGN at the
    per-image reference power (matching the simulator, which measures noise
    power over the whole signal), and normalizes by the noisy chunk max —
    the exact inference protocol.

    AWGN only (the figure protocol); physical-scale signals precomputed on
    the CPU backend once.
    """

    EXTENSIONS = ImageOFDMDataset.EXTENSIONS

    def __init__(
        self,
        image_dir: str,
        chunk: int = 16,
        modulation: str = "QAM16",
        n_subcarriers: int = 64,
        cp_length: int = 16,
        snr_range: Tuple[float, float] = (0, 30),
        samples_per_image: int = 64,
        pad_to: int = 1024,
    ):
        # pad_to mirrors the simulator's frame_length: its channel measures
        # signal power over the padded transmission (zeros included), and
        # the zero chunks are themselves enhancement inputs
        cfg = ImageOFDMConfig(modulation, n_subcarriers, cp_length,
                              frame_length=pad_to)
        self.snr_range = snr_range
        self.samples_per_image = samples_per_image
        self.image_files = ImageOFDMDataset._find_images(self, Path(image_dir))
        if not self.image_files:
            raise FileNotFoundError(f"no images under {image_dir}")
        chunks, powers = [], []
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            for p in self.image_files:
                iq, _ = image_to_ofdm(load_image(str(p)), cfg,
                                      normalize=False, truncate=False)
                pad = (-iq.shape[0]) % chunk
                iq = np.pad(np.asarray(iq), ((0, pad), (0, 0)))
                c = iq.reshape(-1, chunk, 2)
                chunks.append(c)
                # the simulator's channel measures signal power over the
                # WHOLE transmission — every chunk of an image shares it
                powers.append(np.full(c.shape[0], np.mean(iq ** 2) * 2.0,
                                      np.float32))
        self._chunks = jnp.asarray(np.concatenate(chunks))     # [N, chunk, 2]
        self._power = jnp.asarray(np.concatenate(powers))      # [N]

    def __len__(self) -> int:
        return len(self.image_files) * self.samples_per_image

    def sample_batch(self, key: jax.Array, batch_size: int) -> Dict[str, jnp.ndarray]:
        k_idx, k_snr, k_n = jax.random.split(key, 3)
        i = jax.random.randint(k_idx, (batch_size,), 0, self._chunks.shape[0])
        clean = self._chunks[i]                                # physical scale
        snr = jax.random.uniform(k_snr, (batch_size,), jnp.float32,
                                 *self.snr_range)
        noise_power = self._power[i] / (10.0 ** (snr / 10.0))
        std = jnp.sqrt(noise_power / 2.0)[:, None, None]
        noisy = clean + std * jax.random.normal(k_n, clean.shape, jnp.float32)
        # inference-protocol normalization: NOISY chunk max only (the clean
        # signal is unknown at enhancement time)
        m = jnp.max(jnp.abs(noisy), axis=(-2, -1), keepdims=True)
        m = jnp.maximum(m, 1e-9)
        return {"noisy": noisy / m, "clean": clean / m, "snr": snr}
