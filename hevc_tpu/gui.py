"""tkinter GUI front-end (reference main.py/gui parity, C15-C17).

The reference shipped a PySide6 batch-transcode GUI plus a tkinter upscale
GUI; PySide6 is not available in this environment, so both front-ends are
tkinter here.  All behavior lives in hevc_tpu.batch (queue/refill/progress/
cancel are the batch layer's semantics); this module is presentation only.

Run:  python -m hevc_tpu.gui
"""
from __future__ import annotations

import os
import queue
import threading


def main() -> int:
    try:
        import tkinter as tk
        from tkinter import filedialog, ttk
    except ImportError:
        print("tkinter unavailable; use the CLI: python -m hevc_tpu.cli")
        return 1

    from hevc_tpu.batch.scheduler import batch_convert, find_inputs

    root = tk.Tk()
    root.title(f"hevc_tpu batch transcoder")
    root.geometry("720x480")

    in_var = tk.StringVar()
    out_var = tk.StringVar()
    force_cpu = tk.BooleanVar(value=False)   # TPU fast path by default
    skip_val = tk.BooleanVar(value=False)
    workers_var = tk.IntVar(value=2)
    stop_event = threading.Event()
    msg_q: queue.Queue = queue.Queue()

    frm = ttk.Frame(root, padding=8)
    frm.pack(fill="both", expand=True)

    def pick(var):
        d = filedialog.askdirectory()
        if d:
            var.set(d)

    row1 = ttk.Frame(frm)
    row1.pack(fill="x")
    ttk.Label(row1, text="Input:").pack(side="left")
    ttk.Entry(row1, textvariable=in_var, width=50).pack(side="left", padx=4)
    ttk.Button(row1, text="...", command=lambda: pick(in_var)).pack(side="left")
    row2 = ttk.Frame(frm)
    row2.pack(fill="x", pady=2)
    ttk.Label(row2, text="Output:").pack(side="left")
    ttk.Entry(row2, textvariable=out_var, width=50).pack(side="left", padx=4)
    ttk.Button(row2, text="...", command=lambda: pick(out_var)).pack(side="left")

    opts = ttk.Frame(frm)
    opts.pack(fill="x", pady=4)
    ttk.Checkbutton(opts, text="Force robust path (CPU)",
                    variable=force_cpu).pack(side="left")
    ttk.Checkbutton(opts, text="Skip validator",
                    variable=skip_val).pack(side="left", padx=8)
    ttk.Label(opts, text="Workers:").pack(side="left", padx=(12, 2))
    ttk.Spinbox(opts, from_=1, to=os.cpu_count() or 8,
                textvariable=workers_var, width=4).pack(side="left")

    overall = ttk.Progressbar(frm, maximum=100)
    overall.pack(fill="x", pady=4)
    # per-file rows: custom pulse/inverse-text progress bars with a
    # green/red finish border (reference TextProgressBar/FileItemWidget,
    # gui/mainwindow.py:23-153), in a scrollable list.  Rows key by FULL
    # path — the reference keyed by basename and collided (known bug,
    # SURVEY §7).
    from hevc_tpu.gui_widgets import FileItemRow
    list_wrap = ttk.Frame(frm)
    list_wrap.pack(fill="both", expand=True)
    list_canvas = tk.Canvas(list_wrap, height=240)
    scroll = ttk.Scrollbar(list_wrap, orient="vertical",
                           command=list_canvas.yview)
    rows_frame = ttk.Frame(list_canvas)
    rows_frame.bind("<Configure>", lambda e: list_canvas.configure(
        scrollregion=list_canvas.bbox("all")))
    list_canvas.create_window((0, 0), window=rows_frame, anchor="nw")
    list_canvas.configure(yscrollcommand=scroll.set)
    list_canvas.pack(side="left", fill="both", expand=True)
    scroll.pack(side="right", fill="y")
    rows: dict[str, FileItemRow] = {}
    logbox = tk.Text(frm, height=5)
    logbox.pack(fill="x", pady=4)

    progress_state: dict[str, float] = {}

    def progress_cb(name, frame, total):
        msg_q.put(("progress", name, frame, total))

    def run_batch():
        stop_event.clear()
        files = find_inputs(in_var.get())
        msg_q.put(("log", f"{len(files)} files queued"))
        for f in files:
            msg_q.put(("item", str(f), f.name))
        try:
            results = batch_convert(in_var.get(), out_var.get(),
                                    max_workers=workers_var.get(),
                                    progress_callback=progress_cb,
                                    stop_event=stop_event,
                                    force_cpu=force_cpu.get(),
                                    skip_validator=skip_val.get())
            for r in results:
                msg_q.put(("done", r["file"], r["status"]))
            msg_q.put(("log", f"batch finished: "
                       f"{sum(x['status'] == 'SUCCESS' for x in results)}"
                       f"/{len(results)} ok"))
        except Exception as e:
            msg_q.put(("log", f"batch failed: {e}"))

    def start():
        threading.Thread(target=run_batch, daemon=True).start()

    btns = ttk.Frame(frm)
    btns.pack(fill="x")
    ttk.Button(btns, text="Start batch", command=start).pack(side="left")
    ttk.Button(btns, text="Stop all",
               command=stop_event.set).pack(side="left", padx=6)

    def poll():
        try:
            while True:
                msg = msg_q.get_nowait()
                if msg[0] == "log":
                    logbox.insert("end", msg[1] + "\n")
                    logbox.see("end")
                elif msg[0] == "item":
                    path, name = msg[1:]
                    if path not in rows:
                        rows[path] = FileItemRow(rows_frame, name)
                        rows[path].name = name
                elif msg[0] == "progress":
                    name, frame, total = msg[1:]
                    pct = 100 * frame / max(total, 1)
                    progress_state[name] = pct
                    for r in rows.values():
                        if r.name == name:
                            r.bar.status = "encoding"
                            r.set_progress(pct)
                    if progress_state:
                        overall["value"] = (sum(progress_state.values())
                                            / len(progress_state))
                elif msg[0] == "done":
                    name, status = msg[1:]
                    for r in rows.values():
                        if r.name == name:
                            r.set_progress(100)
                            r.set_status(status)
        except queue.Empty:
            pass
        root.after(100, poll)

    poll()
    root.mainloop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
