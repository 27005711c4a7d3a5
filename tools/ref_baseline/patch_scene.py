"""Make a patched copy of a reference scene XML (spp / resolution
overrides, relative asset paths resolved to absolute) so the shim-built
reference binary (build.sh) can render golden images at arbitrary
sizes without touching the read-only reference tree.

Mirrors the reference parser's path handling: parse_scene.cpp:1142-1147
chdirs to the scene dir, so every `filename` attribute is scene-dir
relative; we rewrite them absolute instead.
"""

import argparse
import os
import xml.etree.ElementTree as ET


def patch_scene(src, dst, spp=None, width=None, height=None,
                integrator=None):
    scene_dir = os.path.dirname(os.path.abspath(src))
    tree = ET.parse(src)
    root = tree.getroot()
    if integrator is not None:
        for el in root.iter('integrator'):
            el.set('type', integrator)
    for el in root.iter():
        if el.tag == 'string' and el.get('name') == 'filename':
            v = el.get('value')
            if v and not os.path.isabs(v):
                el.set('value', os.path.normpath(os.path.join(scene_dir, v)))
        if spp is not None and el.tag == 'integer' and \
                el.get('name') == 'sampleCount':
            el.set('value', str(spp))
        if width is not None and el.tag == 'integer' and \
                el.get('name') == 'width':
            el.set('value', str(width))
        if height is not None and el.tag == 'integer' and \
                el.get('name') == 'height':
            el.set('value', str(height))
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    tree.write(dst)
    return dst


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('src')
    ap.add_argument('dst')
    ap.add_argument('--spp', type=int)
    ap.add_argument('--width', type=int)
    ap.add_argument('--height', type=int)
    ap.add_argument('--integrator')
    a = ap.parse_args()
    patch_scene(a.src, a.dst, a.spp, a.width, a.height, a.integrator)
    print(a.dst)
