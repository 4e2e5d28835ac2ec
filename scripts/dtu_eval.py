#!/usr/bin/env python
"""Run the DTU benchmark protocol on fused point clouds (no MATLAB).

Usage: python scripts/dtu_eval.py <outdir>/pcd <dtu_sampleset_root>
"""
import sys

from dmvsnet_tpu.fusion.dtu_eval import evaluate_dtu

if __name__ == "__main__":
    evaluate_dtu(sys.argv[1], sys.argv[2])
