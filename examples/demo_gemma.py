#!/usr/bin/env python
"""demo_gemma — counterpart of /root/reference/examples/demo_gemma.cpp.

The reference's per-family demos share one generate() boilerplate with a
different config class each; here they alias demo_llm.py, which reads the
family from the checkpoint's config.json (models/registry.py dispatch).

  python examples/demo_gemma.py -m <model_dir> [demo_llm flags]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import demo_llm

if __name__ == "__main__":
    demo_llm.main()
