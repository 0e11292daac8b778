"""Offline template-generation orchestrator (replaces C5, src/TemplateGenerator.cpp).

Loops models x radii x viewpoints x in-plane rotations, rendering and
extracting on-device, and persists one TemplateBank per model class.
Resumable: finished banks are skipped on re-run (the reference writes
everything once at the very end and cannot resume, src/TemplateGenerator.cpp:61).
"""

from __future__ import annotations

import os
import sys
import time

from ..config import (
    CameraParameters,
    TemplateSettings,
    files_in_directory,
    load_model_properties,
)
from ..models.template_bank import TemplateBank, build_template_bank
from ..utils.mesh_io import load_mesh


class TemplateGenerator:
    def __init__(
        self,
        cam: CameraParameters,
        settings: TemplateSettings,
        out_dir: str = "banks",
    ):
        self.cam = cam
        self.settings = settings
        self.out_dir = out_dir

    def bank_path(self, model_file: str) -> str:
        return os.path.join(self.out_dir, os.path.splitext(model_file)[0] + ".npz")

    def run(self, verbose: bool = True) -> list:
        """Generate banks for every model in the configured folder."""
        os.makedirs(self.out_dir, exist_ok=True)
        models = files_in_directory(
            self.settings.model_folder, self.settings.model_file_ending
        )
        banks = []
        for model_file in models:
            path = self.bank_path(model_file)
            if os.path.exists(path):
                if verbose:
                    print(f"[generate] {model_file}: bank exists, skipping")
                banks.append(TemplateBank.load(path))
                continue
            t0 = time.time()
            mesh = load_mesh(os.path.join(self.settings.model_folder, model_file))
            props = load_model_properties(
                os.path.join(self.settings.model_folder, model_file)
            )
            n_radii = len(self.settings.radii)

            def progress(radius, count):
                if verbose:
                    done = (radius - self.settings.distance_start) // self.settings.distance_step + 1
                    pct = int(100 * done / n_radii)
                    bar = "=" * (pct // 2) + ">"
                    sys.stdout.write(
                        f"\r[{bar:<51}] {pct:3d}% {model_file} ({count} templates, "
                        f"{time.time() - t0:.0f}s)"
                    )
                    sys.stdout.flush()

            bank = build_template_bank(
                mesh, model_file, self.cam, self.settings, props, progress=progress
            )
            bank.save(path)
            if verbose:
                print(
                    f"\n[generate] {model_file}: {bank.num_templates} templates "
                    f"in {time.time() - t0:.1f}s -> {path}"
                )
            banks.append(bank)
        return banks
