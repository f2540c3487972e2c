"""Tier/knob policy pinning (VERDICT round-4 item 7): the measured-best
defaults live in CODE (env-knob defaults + scene.auto_cluster_size), and
this test pins them so sweeps don't rot — with every RRT_* env var
UNSET, each shipped asset must land on its measured-best tier and every
schedule knob on its measured-best default (TODO.md round-3/4 device
sweeps; each expected value below cites its measurement)."""

import json
import os
import subprocess
import sys

from refraction_tpu.scene import auto_cluster_size

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_assets_land_on_measured_best_tier():
    """Cluster-size tiers, re-swept round 4 under the rational+paired
    defaults (TODO.md: ott 1024>512>256, monkey 1024 single-cluster,
    shell 128 — nested shells want fine culling, streamed 512 — DMA-ring
    SMEM cap)."""
    assert auto_cluster_size(967) == 1024     # monkey.obj
    assert auto_cluster_size(768) == 1024     # sphere.obj
    assert auto_cluster_size(12) == 1024      # cube.obj
    assert auto_cluster_size(1536) == 128     # shell.obj
    assert auto_cluster_size(12877) == 1024   # ott.obj
    assert auto_cluster_size(81920) == 512    # streamed synthetic


def test_knob_defaults_are_measured_best():
    """Schedule-knob defaults with RRT_* unset, read in a subprocess with
    a scrubbed environment (module-level knobs bind at import). Expected
    values are the measured-best choices from the TODO.md sweeps:

    - RATIONAL on: monkey 14.19->13.99, shell 11.69->11.61, ott
      40.51->39.68 (round 4)
    - FUSEWORDS on (monkey 13.10->13.06) with PAIR_FUSED=4 width-4 picks
      (ott 34.76->34.30); per-word PAIR stays 2 (width 4 lost: ott
      39.68->40.35)
    - SEQGATE off (monkey 13.10->15.85 when on), SUBWORD=32 (16: ott
      41.5->52.3), SUBTRIS=8 (4/16 monotone loss), ENV_SCAN=16,
      ENV_SUB=8 (4: monkey 14.71->15.70), ENV static-word path up to 8
      words (shipped coded assets: 3)
    - F2B + F2B_SUB on (ott 54.6->52.6; sub order free, inert unless
      SEQGATE), SUPER threshold 32 (ott -1.0 ms), SPP_BATCH on (the
      config-5 regime), CURVE=median (ott 51.5->48.2 class wins)
    """
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("RRT_")}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import json\n"
        "import refraction_tpu.kernels.intersect_pallas as ip\n"
        "import refraction_tpu.kernels.framekernel as fk\n"
        "import refraction_tpu.kernels.envmap_pallas as ep\n"
        "import refraction_tpu.scene as sc\n"
        "import os\n"
        "print(json.dumps({\n"
        "  'rational': ip._RATIONAL, 'fusewords': ip._FUSEWORDS,\n"
        "  'fuse_w': ip._FUSE_W, 'visit_w': ip._VISIT_W,\n"
        "  'seqgate': ip._SEQGATE,\n"
        "  'subword': int(os.environ.get('RRT_SUBWORD', '32')),\n"
        "  'f2b': fk._F2B, 'f2b_sub': fk._F2B_SUB,\n"
        "  'super_min': fk._SUPER_MIN_C, 'spp_batch': fk._SPP_BATCH,\n"
        "  'slot_batch': fk._SLOT_BATCH,\n"
        "  'env_scan': ep._SCAN_ROWS, 'env_sub': ep._ENV_SUB,\n"
        "  'env_static_words': ep._STATIC_ENV_WORDS,\n"
        "  'env_gate': ep._ENV_GATE, 'tri_vmem': fk._TRI_VMEM,\n"
        "  'flat1': ip._FLAT1,\n"
        "  'subtris': sc.SUB_TRIS, 'super_size': sc.SUPER_CLUSTERS,\n"
        "  'curve': os.environ.get('RRT_CURVE', 'median'),\n"
        "}))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {
        "rational": True, "fusewords": True, "fuse_w": 4, "visit_w": 2,
        "seqgate": False, "subword": 32,
        "f2b": True, "f2b_sub": True, "super_min": 32,
        "spp_batch": True, "slot_batch": False,
        "env_scan": 16, "env_sub": 8, "env_static_words": 8,
        "env_gate": False, "tri_vmem": False, "flat1": True,
        "subtris": 8, "super_size": 32, "curve": "median",
    }
