#!/usr/bin/env python
"""demo_minicpm_moe_mbp — counterpart of /root/reference/examples/demo_minicpm_moe_mbp.cpp.

The reference's per-family demos share one generate() boilerplate with a
different config class each; here they alias demo_llm.py, which reads the
family from the checkpoint's config.json (models/registry.py dispatch).
Defaults to `--mbp 2` (the variant this demo exists for).

  python examples/demo_minicpm_moe_mbp.py -m <model_dir> [demo_llm flags]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import demo_llm

if __name__ == "__main__":
    if "--mbp" not in sys.argv:
        sys.argv[1:1] = ['--mbp', '2']
    demo_llm.main()
