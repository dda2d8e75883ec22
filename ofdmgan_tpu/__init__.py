"""ofdmgan_tpu — TPU-native CWGAN-GP framework for OFDM I/Q signal reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``orpheus016/ofdm-gan-sr`` (see SURVEY.md): synthetic OFDM physical-layer
simulation fused on-device, Mini U-Net generator + conditional Wasserstein
critic, a fully-jitted CWGAN-GP training step with nested-grad gradient
penalty, shard_map data parallelism over a TPU mesh, classical equalizer
baselines, and a bit-exact Q1.7/Q8.8 fixed-point inference + export path
(the TPU-native equivalent of the reference's Verilog RTL datapath).

Layout convention: signals are channels-last ``[batch, length, 2]`` (I/Q)
throughout the framework — the TPU-friendly layout. Converters to/from the
reference's ``[batch, 2, length]`` layout live in ``ofdmgan_tpu.utils.iq``.
"""

__version__ = "0.1.0"
