"""SVG radial collocation plot (driver-side, not an engine op).

Reference parity (F10/W5, ``viz/RadialPlot.java:18-232``): golden-angle
(≈137.5°) Archimedean spiral layout; |score| → radius and grayscale;
top-30 clamp sorted by |score| desc (``RadialPlot.java:104-114``).
"""

from __future__ import annotations

import math

GOLDEN_ANGLE = math.radians(137.50776405003785)
MAX_POINTS = 30


def radial_plot_svg(items: list[tuple[str, float]], size: int = 600,
                    title: str = "") -> str:
    """``[(label, score)]`` → standalone SVG string.

    Top-30 by |score| (W5 clamp); radius grows along the spiral with
    stronger collocates near the center, grayscale by normalized score.
    """
    items = sorted(items, key=lambda x: -abs(x[1]))[:MAX_POINTS]
    cx = cy = size / 2
    max_r = size / 2 - 60
    smax = max((abs(s) for _, s in items), default=1.0) or 1.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">',
        f'<rect width="{size}" height="{size}" fill="white"/>',
    ]
    if title:
        parts.append(
            f'<text x="{cx}" y="24" text-anchor="middle" '
            f'font-size="16" font-family="sans-serif">{title}</text>')
    n = max(len(items), 1)
    for i, (label, score) in enumerate(items):
        # Archimedean spiral at golden-angle increments
        theta = i * GOLDEN_ANGLE
        r = max_r * math.sqrt((i + 1) / n)
        x = cx + r * math.cos(theta)
        y = cy + r * math.sin(theta)
        rel = abs(score) / smax
        shade = int(200 - 170 * rel)  # stronger → darker
        radius = 6 + 10 * rel
        parts.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{radius:.1f}" '
            f'fill="rgb({shade},{shade},{shade})"/>')
        parts.append(
            f'<text x="{x:.1f}" y="{y - radius - 3:.1f}" '
            f'text-anchor="middle" font-size="11" '
            f'font-family="sans-serif">{label} ({score:.2f})</text>')
    parts.append("</svg>")
    return "\n".join(parts)
