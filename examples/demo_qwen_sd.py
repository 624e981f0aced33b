#!/usr/bin/env python
"""demo_qwen_sd — counterpart of /root/reference/examples/demo_qwen_sd.cpp
(suffix-automaton speculative decoding).  Alias of demo_sd.py; add
--compiled for the fully on-device prompt-lookup SD loop.

  python examples/demo_qwen_sd.py -m <model_dir> [demo_sd flags]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import demo_sd

if __name__ == "__main__":
    demo_sd.main()
