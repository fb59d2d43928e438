"""Stub `pycocotools` — import-satisfying only (the trajectory harness
uses SRN/CARLA-format fixtures, which never decode COCO RLE masks)."""
