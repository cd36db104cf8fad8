"""Minimal self-contained HTML gallery writer.

Replaces the reference's tu/loggers HTML table stack (html_table.py /
html_helper.py / utils.py, ~550 LoC): one class that accumulates tables of
images / videos / text and writes a standalone index.html with assets under
<dir>/assets/."""
from __future__ import annotations

import html
import os
import shutil
from typing import List, Optional

import numpy as np


class HTMLVisualizer:
    def __init__(self, out_dir: str, title: str = ""):
        self.out_dir = out_dir
        self.assets_dir = os.path.join(out_dir, "assets")
        os.makedirs(self.assets_dir, exist_ok=True)
        self.title = title
        self._tables: List[str] = []
        self._n_assets = 0

    # -- asset helpers -------------------------------------------------------

    def _asset_path(self, suffix: str) -> str:
        self._n_assets += 1
        return os.path.join(self.assets_dir, f"asset_{self._n_assets:05d}{suffix}")

    def add_image_cell(self, img: np.ndarray) -> str:
        from .visualize import save_image

        path = self._asset_path(".png")
        save_image(path, img)
        rel = os.path.relpath(path, self.out_dir)
        return f'<img src="{rel}" />'

    def add_video_cell(self, frames, fps: int = 25, fmt: str = "mp4") -> str:
        from .visualize import save_video

        path = save_video(self._asset_path(f".{fmt}"), frames, fps=fps)
        rel = os.path.relpath(path, self.out_dir)
        if path.endswith(".gif"):
            return f'<img src="{rel}" />'
        return f'<video autoplay loop muted playsinline src="{rel}"></video>'

    # -- tables --------------------------------------------------------------

    def dump_table(self, rows: List[List[str]], col_names: Optional[List[str]] = None,
                   table_name: str = "") -> None:
        parts = [f"<h3>{html.escape(table_name)}</h3>" if table_name else "", "<table border='1'>"]
        if col_names:
            parts.append("<tr>" + "".join(f"<th>{html.escape(c)}</th>" for c in col_names) + "</tr>")
        for row in rows:
            cells = []
            for cell in row:
                if isinstance(cell, str) and (cell.startswith("<img") or cell.startswith("<video")):
                    cells.append(f"<td>{cell}</td>")
                else:
                    cells.append(f"<td>{html.escape(str(cell))}</td>")
            parts.append("<tr>" + "".join(cells) + "</tr>")
        parts.append("</table>")
        self._tables.append("\n".join(parts))
        self.flush()

    def flush(self) -> None:
        doc = (
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(self.title)}</title></head><body>"
            f"<h2>{html.escape(self.title)}</h2>" + "\n".join(self._tables) + "</body></html>"
        )
        with open(os.path.join(self.out_dir, "index.html"), "w") as f:
            f.write(doc)
