#!/usr/bin/env python
"""demo_showui — counterpart of /root/reference/examples/demo_showui.cpp.

ShowUI is a Qwen2-VL-architecture UI-grounding model (the reference demo is
demo_qwen2_vl boilerplate with a grounding system prompt); this aliases
demo_qwen2_vl.py with that prompt as the default.

  python examples/demo_showui.py -m <showui_dir> -i screenshot.png \
      [--prompt "click the search box"]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import demo_qwen2_vl

_GROUNDING = ("Based on the screenshot of the page, I give a text description "
              "and you give its corresponding location. The coordinate "
              "represents a clickable location [x, y] for an element, which "
              "is a relative coordinate on the screenshot, scaled from 0 to 1.")

if __name__ == "__main__":
    if "--prompt" not in sys.argv:
        sys.argv[1:1] = ["--prompt", _GROUNDING]
    demo_qwen2_vl.main()
