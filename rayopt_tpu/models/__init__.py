from .prescriptions import (  # noqa: F401
    doublet, cooke_triplet, double_gauss, petzval, parabolic_mirror,
    hene_cavity, beam_expander, spectrograph, anamorphic_pair,
    fisheye, zoom_telephoto, hybrid_achromat, thorlabs_la1131,
    thorlabs_la1509, PRESCRIPTIONS,
)
