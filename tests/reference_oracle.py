"""Import helpers for using the read-only PyTorch reference as a test oracle.

The reference at /root/reference is imported (never copied) to produce
golden outputs from randomly-initialized torch modules; our Flax modules
must match through the interop weight mapping. Tests using this skip
cleanly when the reference tree is absent.
"""

import os
import sys
import types

REFERENCE_ROOT = os.environ.get("ADAFACE_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "ldm"))


_stubbed = False


def import_reference_module(name: str):
    """Import `ldm.*` from the reference tree with unavailable heavy deps
    (torchvision etc.) stubbed out."""
    global _stubbed
    if not _stubbed:
        import importlib.machinery

        for mod in [
            "torchvision", "torchvision.utils", "torchvision.transforms",
            "torchvision.transforms.functional",
        ]:
            if mod not in sys.modules:
                m = types.ModuleType(mod)
                m.__spec__ = importlib.machinery.ModuleSpec(mod, loader=None)
                sys.modules[mod] = m
        tvu = sys.modules["torchvision.utils"]
        tvu.make_grid = lambda *a, **k: None
        tvu.draw_bounding_boxes = lambda *a, **k: None
        tvt = sys.modules["torchvision.transforms"]
        for fn in ["Resize", "CenterCrop", "Compose", "ToTensor", "Normalize", "RandomAffine"]:
            setattr(tvt, fn, lambda *a, **k: None)
        if "pytorch_lightning" not in sys.modules:
            import torch

            pl = types.ModuleType("pytorch_lightning")
            pl.LightningModule = torch.nn.Module
            pl.seed_everything = lambda *a, **k: None
            sys.modules["pytorch_lightning"] = pl
        if "omegaconf" not in sys.modules:
            oc = types.ModuleType("omegaconf")
            lc = types.ModuleType("omegaconf.listconfig")

            class ListConfig(list):
                pass

            lc.ListConfig = ListConfig
            oc.ListConfig = ListConfig
            oc.OmegaConf = types.SimpleNamespace(create=lambda *a, **k: a[0] if a else {})
            oc.listconfig = lc
            sys.modules["omegaconf"] = oc
            sys.modules["omegaconf.listconfig"] = lc
        if "taming" not in sys.modules:
            taming = types.ModuleType("taming")
            tm = types.ModuleType("taming.modules")
            tv = types.ModuleType("taming.modules.vqvae")
            tq = types.ModuleType("taming.modules.vqvae.quantize")
            tq.VectorQuantizer2 = object
            for modname, mod in [("taming", taming), ("taming.modules", tm),
                                 ("taming.modules.vqvae", tv),
                                 ("taming.modules.vqvae.quantize", tq)]:
                sys.modules[modname] = mod
        # `ldm.modules.encoders.modules` imports clip + kornia at module
        # level; only non-FrozenCLIPEmbedder classes use them
        for mod in ("clip", "kornia"):
            if mod not in sys.modules:
                m2 = types.ModuleType(mod)
                m2.__spec__ = importlib.machinery.ModuleSpec(mod, loader=None)
                m2.load = lambda *a, **k: (None, None)
                sys.modules[mod] = m2
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        # ldm.modules.subj_basis_generator downloads a CLIP tokenizer at
        # import time (line 22) — impossible under zero egress, so stub the
        # whole module; embedding_manager only imports the class name.
        if "ldm.modules.subj_basis_generator" not in sys.modules:
            sbg = types.ModuleType("ldm.modules.subj_basis_generator")

            class SubjBasisGenerator:  # placeholder, never instantiated in tests
                pass

            sbg.SubjBasisGenerator = SubjBasisGenerator
            sbg.CLIPVisionModelWithMask = object
            sys.modules["ldm.modules.subj_basis_generator"] = sbg
        # `ldm.models.diffusion.ddpm` additionally needs these at import
        # time (the oracle only drives its pure loss METHODS, never
        # instantiates the Lightning module)
        if "pytorch_lightning.utilities.distributed" not in sys.modules:
            plu = types.ModuleType("pytorch_lightning.utilities")
            plud = types.ModuleType("pytorch_lightning.utilities.distributed")
            plud.rank_zero_only = lambda fn: fn
            plu.distributed = plud
            sys.modules["pytorch_lightning.utilities"] = plu
            sys.modules["pytorch_lightning.utilities.distributed"] = plud
        if "insightface" not in sys.modules:
            insf = types.ModuleType("insightface")
            insa = types.ModuleType("insightface.app")
            insa.FaceAnalysis = object
            insf.app = insa
            sys.modules["insightface"] = insf
            sys.modules["insightface.app"] = insa
        if "evaluation.clip_eval" not in sys.modules:
            ev = types.ModuleType("evaluation")
            evc = types.ModuleType("evaluation.clip_eval")
            evc.CLIPEvaluator = object
            ev.clip_eval = evc
            sys.modules["evaluation"] = ev
            sys.modules["evaluation.clip_eval"] = evc
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        _stubbed = True
    import importlib

    return importlib.import_module(name)
