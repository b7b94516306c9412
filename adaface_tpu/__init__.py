"""adaface_tpu — TPU-native subject-driven text-to-image generation.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
AdaPrompt/AdaFace reference stack (Stable Diffusion v1.5 + adaptive prompt
embeddings + zero-shot identity conditioning). See SURVEY.md at the repo root
for the structural map of the reference this framework re-implements.

Layout:
    ops/              schedule math, norms, attention, Pallas kernels
    models/           CLIP text/vision, VAE, SD U-Net, ArcFace, DINO (Flax)
    personalization/  embedding manager, static layerwise embeddings,
                      subject-basis generator, Arc2Face encoder
    samplers/         DDIM / PLMS as lax.scan loops with annealed CFG
    interop/          torch-free .ckpt/.pt/.safetensors readers + name maps
    parallel/         device mesh + sharding rules (pjit data/tensor parallel)
    training/         losses, Prodigy optimizer, iteration planner, train step
    data/             subject datasets, prompt composition
    evaluation/       CLIP-I/CLIP-T/DINO/face-sim metric harness
"""

__version__ = "0.1.0"
