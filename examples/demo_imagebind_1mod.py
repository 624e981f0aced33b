#!/usr/bin/env python
"""demo_imagebind_1mod — counterpart of
/root/reference/examples/demo_imagebind_1mod.cpp (single-modality encode:
one ImageBind tower instead of the tri-modal score).  Alias of
demo_imagebind.py without the audio leg.

  python examples/demo_imagebind_1mod.py -i image.jpg [--texts ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import demo_imagebind

if __name__ == "__main__":
    demo_imagebind.main()
