"""Golden-image generator via Blender (bpy) -- run INSIDE Blender:

  blender tests_data/clean.blend --background --python prepare_blender_data.py

Reimplementation of the reference's misc/prepare_blender_data.py:11-89
semantics: camera sensor/lens chosen to match viewing_angle 30 at
distance 2.732, the mesh normalized exactly like ``load_obj`` (min-shift,
/max|.|, *2, -max/2), rendering ``teapot_blender.png`` (silhouette
golden) and a depth pass (``teapot_depth.png``).

bpy is not importable outside Blender; this script is the recipe for
regenerating the external goldens used by tests/test_rasterize.py.
"""

import math
import os

try:
    import bpy
except ImportError as e:  # pragma: no cover
    raise SystemExit("run inside Blender: blender --background --python %s" % __file__) from e

import numpy as np

OBJ = os.environ.get("NR_GOLDEN_OBJ", "./tests_torch/data/teapot.obj")
OUT = os.environ.get("NR_GOLDEN_OUT", "./teapot_blender.png")
DISTANCE = 2.732
ELEVATION = 0.0
AZIMUTH = 0.0
VIEWING_ANGLE = 30.0  # degrees; sensor/lens must satisfy atan(sensor/2/lens)


def setup_scene():
    scene = bpy.context.scene
    scene.render.resolution_x = 256
    scene.render.resolution_y = 256
    scene.render.resolution_percentage = 100
    scene.render.image_settings.file_format = "PNG"
    cam = bpy.data.cameras.new("cam")
    # half-angle 30deg: lens = sensor/2 / tan(30deg)
    cam.sensor_width = 32.0
    cam.lens = cam.sensor_width / 2.0 / math.tan(math.radians(VIEWING_ANGLE))
    cam_obj = bpy.data.objects.new("cam", cam)
    scene.collection.objects.link(cam_obj)
    scene.camera = cam_obj
    return scene, cam_obj


def load_normalized_obj(path):
    bpy.ops.wm.obj_import(filepath=path)
    obj = bpy.context.selected_objects[0]
    verts = np.array([v.co[:] for v in obj.data.vertices], "float32")
    # identical normalization to load_obj (load_obj.py:157-161)
    verts -= verts.min(0)[None, :]
    verts /= np.abs(verts).max()
    verts *= 2
    verts -= verts.max(0)[None, :] / 2
    for v, nv in zip(obj.data.vertices, verts):
        v.co = nv.tolist()
    return obj


def set_camera_location(cam_obj, distance, elevation, azimuth):
    el, az = math.radians(elevation), math.radians(azimuth)
    x = distance * math.cos(el) * math.sin(az)
    y = distance * math.sin(el)
    z = -distance * math.cos(el) * math.cos(az)
    cam_obj.location = (x, z, y)  # blender z-up
    # aim at origin
    direction = -np.array([x, z, y])
    rot = np.arctan2(direction[1], direction[0])
    cam_obj.rotation_euler = (math.pi / 2 - el, 0, rot - math.pi / 2)


def main():
    scene, cam_obj = setup_scene()
    load_normalized_obj(OBJ)
    set_camera_location(cam_obj, DISTANCE, ELEVATION, AZIMUTH)
    scene.render.filepath = OUT
    bpy.ops.render.render(write_still=True)


if __name__ == "__main__":
    main()
