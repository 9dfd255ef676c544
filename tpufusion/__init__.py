"""tpufusion — TPU-native framework for adversarial attacks on GAN-based image fusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Wu-sm/Adversarial-Attacks-on-GAN-based-Image-Fusion`` (reference mounted at
``/root/reference``).  The reference is a single-GPU PyTorch attack lab; this
package is a functional, jit-compiled, mesh-shardable pipeline:

- ``models``   — StyleGAN2 generator with style-vector API + feature taps,
                 e4e (IR-SE50) encoder, VGG16 perceptual tap stack, StyleGAN2
                 discriminator, StyleFusion hierarchy of fusion nets.
- ``fusion``   — the "drawer" facade (latent conversions, s-dict assembly),
                 spatial (per-part) and arithmetic (mean-W+) fusion.
- ``attacks``  — PGD/FGSM/CW, white-box Adam pixel attacks, adversarial patch
                 training, baseline perturbations, hybrid splicing — all as
                 ``lax.scan``-compiled optimizer loops, vmappable over batches.
- ``ops``      — Pallas TPU kernels + XLA fallbacks for the hot ops
                 (modulated conv scaling, upfirdn2d blur, fused PGD update,
                 masked patch composite).
- ``parallel`` — ``jax.sharding.Mesh`` axes and sharding rules (data/model).
- ``data``     — folder dataset scan/decode/transform, face-alignment geometry.
- ``eval``     — MSE/SSIM/VGG-distance metrics, partial-fusion harness, reports.
- ``io``       — PyTorch checkpoint conversion, run dirs, artifacts, montages.

Conventions (TPU-first, differing deliberately from the reference):
- images are NHWC float32/bfloat16 in [-1, 1] (reference: NCHW torch tensors);
- every model is a pure ``init``/``apply`` pair over a params pytree;
- no data-dependent python control flow inside jitted regions;
- noise buffers are deterministic (reference ``randomize_noise=False``).
"""

__version__ = "0.1.0"
