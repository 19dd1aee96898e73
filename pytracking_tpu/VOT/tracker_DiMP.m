% VOT toolkit (MATLAB) integration stub for pytracking_tpu — the counterpart of
% reference pytracking/VOT/tracker_DiMP.m. Drop this file into your VOT
% workspace's tracker directory and fill in the three paths below; the MATLAB
% toolkit then drives the tracker over the TraX protocol implemented in
% pytracking_tpu/evaluation/vot.py (pure python client, no compiled trax
% bindings needed on the python side).

% Path to the python interpreter of the environment with jax + pytracking_tpu
python_path = 'PATH_TO_ENV/bin/python';

% Path to the repository root (the directory containing pytracking_tpu/)
pytracking_tpu_path = 'PATH_TO_PYTRACKING_TPU';

% Path to the trax installation shipped with the VOT toolkit. See
% https://trax.readthedocs.io/en/latest/tutorial_compiling.html
trax_path = 'PATH_TO_VOT_TOOLKIT/native/trax';

tracker_name = 'dimp';          % Tracker family (pytracking_tpu/trackers/)
runfile_name = 'dimp18_vot18';  % Parameter file (pytracking_tpu/parameter/dimp/)
debug = 0;

%%
tracker_label = [tracker_name, '_', runfile_name];

% Generate python command: run_vot uses the legacy polygon protocol
% (pytracking_tpu/evaluation/vot.py:144); VOT2020 mask workspaces should use
% the trackers.ini `traxpython` route instead (run_vot2020).
tracker_command = sprintf(['%s -c "import sys; sys.path.append(''%s'');', ...
                           'sys.path.append(''%s/support/python'');', ...
                           'from pytracking_tpu import run_vot;', ...
                           'run_vot.run_vot(''%s'', ''%s'')"'],...
                           python_path, pytracking_tpu_path, trax_path, ...
                           tracker_name, runfile_name);

tracker_interpreter = python_path;

tracker_linkpath = {[trax_path, '/build'],...
		[trax_path, '/build/support/client'],...
		[trax_path, '/build/support/opencv']};
