"""State/input dimensions (reference: car_racing/utils/constants.py:1).

State conventions (identical to the reference):
- curvilinear state ``xcurv = [vx, vy, wz, epsi, s, ey]``
- global state      ``xglob = [vx, vy, wz, psi, X, Y]``
- input             ``u = [delta (steering), a (acceleration)]``
"""

X_DIM = 6
U_DIM = 2
